"""Adversarial-input generators + phase-switch metrics (utils.mutate)."""
import numpy as np

from tests import fixtures
from xsqueezeit_tpu.utils import mutate
from xsqueezeit_tpu.io.unified import GtInput


def _gts(path):
    inp = GtInput(path)
    rows = [(rec.gt.copy(), rec.ploidy) for rec in inp]
    inp.close()
    return rows


def test_unphase_sorts_and_unphases(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=13, n_records=25, seed=3)
    out = str(tmp_path / "out.vcf")
    n = mutate.unphase(src, out)
    assert n == 25
    for (gt, p), (gt0, _) in zip(_gts(out), _gts(src)):
        assert p == 2
        assert not (gt & 1).any()                     # all unphased
        a = (gt >> 1) - 1
        pairs = a.reshape(-1, 2)
        assert (pairs[:, 0] <= pairs[:, 1]).all()     # sorted
        a0 = np.sort(((gt0 >> 1) - 1).reshape(-1, 2), axis=1)
        np.testing.assert_array_equal(pairs, a0)      # same multiset


def test_unphase_random_preserves_multiset(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=9, n_records=12, seed=4)
    out = str(tmp_path / "out.vcf")
    mutate.unphase_random(src, out, seed=1)
    for (gt, _), (gt0, _) in zip(_gts(out), _gts(src)):
        assert not (gt & 1).any()
        a = np.sort(((gt >> 1) - 1).reshape(-1, 2), axis=1)
        a0 = np.sort(((gt0 >> 1) - 1).reshape(-1, 2), axis=1)
        np.testing.assert_array_equal(a, a0)


def test_sprinkle_missing_rate_and_phase(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=40, n_records=50, seed=5)
    out = str(tmp_path / "out.vcf")
    mutate.sprinkle_missing(src, out, rate=0.2, seed=7)
    total = hit = 0
    for (gt, _), (gt0, _) in zip(_gts(out), _gts(src)):
        miss = (gt >> 1) == 0
        # untouched entries identical, hit entries keep the phase bit
        np.testing.assert_array_equal(gt[~miss], gt0[~miss])
        np.testing.assert_array_equal(gt[miss] & 1, gt0[miss] & 1)
        hit += int(miss.sum())
        total += gt.shape[0]
    assert 0.1 < hit / total < 0.3

    # sprinkled file still round-trips through the codec
    from xsqueezeit_tpu.codec.compressor import compress_file
    from xsqueezeit_tpu.codec.decompressor import Decompressor
    xsi = str(tmp_path / "m.xsi")
    compress_file(out, xsi)
    back = str(tmp_path / "back.vcf")
    Decompressor(xsi).decompress(back)
    for (gt, _), (gt0, _) in zip(_gts(back), _gts(out)):
        np.testing.assert_array_equal(gt, gt0)


def test_bcf_output_roundtrip(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=7, n_records=10, seed=6)
    out = str(tmp_path / "out.bcf")
    mutate.unphase(src, out)
    rows = _gts(out)
    assert len(rows) == 10
    assert not any((gt & 1).any() for gt, _ in rows)


def test_count_entries_and_matrix(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=5, n_records=17, seed=8)
    assert mutate.count_entries(src) == 17
    m = mutate.extract_matrix(src)
    assert m.shape == (17, 10)
    assert not mutate.matrices_differ(m, m.copy())
    m2 = m.copy()
    m2[0, 0] ^= True
    assert mutate.matrices_differ(m, m2)


def test_phase_switch_errors(tmp_path):
    src = str(tmp_path / "in.vcf")
    fixtures.random_vcf(src, n_samples=11, n_records=60, seed=9)
    same = mutate.compute_phase_switch_errors(src, src)
    assert same["total"] == 0
    flipped = str(tmp_path / "flip.vcf")
    mutate.unphase_random(src, flipped, seed=2)  # random allele order
    diff = mutate.compute_phase_switch_errors(flipped, src)
    assert diff["total"] > 0
    assert len(diff["per_sample"]) == 11


def test_inject_phase_switches_roundtrip(tmp_path):
    """The full sandbox.hpp workflow: inject switch errors -> measure them
    (they must match the injected count) -> repair with the PBWT phaser
    (errors must drop substantially)."""
    from xsqueezeit_tpu.utils.mutate import (
        compute_phase_switch_errors,
        extract_matrix,
        inject_phase_switches,
    )
    from xsqueezeit_tpu.utils.phasing import phase_file

    # a founder-mosaic panel: the PBWT phaser needs LD structure to
    # repair anything (random genotypes are unphaseable by construction)
    from tests.test_phasing_stats import _haplotype_panel_vcf
    vcf = _haplotype_panel_vcf(str(tmp_path / "in.vcf"), n_samples=30,
                               n_records=200, seed=91)
    bad = str(tmp_path / "bad.bcf")
    events = inject_phase_switches(vcf, bad, prob=0.02, seed=7)
    assert events > 5

    # each toggle at het site i>0 flips exactly one inter-site parity; a
    # toggle at a sample's FIRST het site is invisible to the metric
    m = compute_phase_switch_errors(bad, vcf)
    assert events - 30 <= m["total"] <= events

    # carrier matrix is preserved (only within-sample slot order changes)
    a = extract_matrix(vcf)
    b = extract_matrix(bad)
    assert a.shape == b.shape
    ap = a.reshape(a.shape[0], -1, 2)
    bp = b.reshape(b.shape[0], -1, 2)
    np.testing.assert_array_equal(np.sort(ap, axis=2), np.sort(bp, axis=2))

    # phase_file re-phases from scratch (it cannot exploit the mostly-
    # correct input phase, like the reference's phase_xcf); its error
    # floor on a founder-mosaic panel is a few %, far below the 50% of a
    # random phasing — assert the floor, not improvement over 2% injected
    fixed = str(tmp_path / "fixed.bcf")
    phase_file(bad, fixed)
    m2 = compute_phase_switch_errors(fixed, vcf)
    assert m2["rate"] < 0.15
