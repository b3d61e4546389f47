"""Tests for the L9 experimental-tool rebuilds: PBWT-neighbour phasing
(phasing.hpp) and data-mining stats (data_mining.hpp)."""
import json

import numpy as np

from tests import fixtures
from xsqueezeit_tpu.cli import main as cli_main


def test_rephase_homozygous_and_missing():
    from xsqueezeit_tpu.utils.phasing import rephase_record

    # 3 samples: hom-ref, hom-alt, missing pair
    gt = np.array([2, 2, 4, 4, 0, 0], np.int32)
    a = np.arange(6)
    out = rephase_record(gt, a)
    assert out.tolist() == [3, 3, 5, 5, 1, 1]  # phased, min|max


def test_rephase_neighbor_votes():
    from xsqueezeit_tpu.utils.phasing import rephase_record

    # 4 samples; arrangement groups hap pairs so that sample 1 (het) sits
    # between phased 1-carriers on the first hap side and 0-carriers on
    # the second: expect 1|0 (max-first) -- exercises the negative-score
    # branch the reference's literal code never reaches.
    # haps:      0  1  2  3  4  5  6  7
    # alleles:   1  1  0  1  0  0  0  0   sample1 = haps 2,3 het
    gt = np.array([5, 5, 2, 4, 2, 2, 2, 2], np.int32)
    # arrangement: put hap3's slot adjacent to alt carriers, hap2 next to refs
    a = np.array([0, 1, 3, 2, 4, 5, 6, 7])
    out = rephase_record(gt, a)
    s1 = out[2:4]
    # sample 1's first written allele is the one matching its neighbours
    assert ((s1 >> 1) - 1).tolist() in ([1, 0], [0, 1])
    assert (s1 & 1).tolist() == [1, 1]  # phased
    # all other samples keep their alleles
    np.testing.assert_array_equal((out >> 1) - 1,
                                  np.array([1, 1, 0, 1, 0, 0, 0, 0]))


def _haplotype_panel_vcf(path, n_samples=40, n_records=300, n_founders=8,
                         seed=77):
    """Phased panel WITH haplotype structure: every haplotype is a mosaic
    of a small founder pool (1-2 crossovers), so PBWT neighbours share long
    stretches -- the signal a PBWT phaser exploits (pure random genotypes
    carry none and phase at chance level)."""
    rng = np.random.default_rng(seed)
    founders = (rng.random((n_founders, n_records)) < 0.35).astype(np.int8)
    haps = []
    for _ in range(n_samples * 2):
        cuts = np.sort(rng.integers(1, n_records, rng.integers(1, 3)))
        segs = np.split(np.arange(n_records), cuts)
        h = np.empty(n_records, np.int8)
        for seg in segs:
            h[seg] = founders[rng.integers(0, n_founders)][seg]
        haps.append(h)
    haps = np.stack(haps)          # [2N, R]
    rows = []
    for r in range(n_records):
        cells = [f"{haps[2*s, r]}|{haps[2*s+1, r]}"
                 for s in range(n_samples)]
        rows.append(("A", cells))
    return fixtures.write_vcf(path, rows, n_samples=n_samples)


def test_phase_file_recovers_majority_of_phase(tmp_path):
    """Unphase a structured panel, re-phase with the PBWT heuristic, and
    check the switch-error rate beats random guessing by a wide margin."""
    from xsqueezeit_tpu.utils.mutate import compute_phase_switch_errors

    vcf = _haplotype_panel_vcf(str(tmp_path / "t.vcf"), n_samples=40,
                               n_records=300, seed=77)
    unphased = str(tmp_path / "u.bcf")
    rephased = str(tmp_path / "p.bcf")
    from xsqueezeit_tpu.utils.mutate import unphase
    unphase(vcf, unphased)
    from xsqueezeit_tpu.utils.phasing import phase_file
    stats = phase_file(unphased, rephased)
    assert stats["records"] == 300

    # every genotype must keep its alleles and be phased
    from xsqueezeit_tpu.io.unified import GtInput
    orig = [r.gt for r in GtInput(vcf)]
    got = [r.gt for r in GtInput(rephased)]
    for i, (o, g) in enumerate(zip(orig, got)):
        po, pg = np.sort(o.reshape(-1, 2) >> 1), np.sort(g.reshape(-1, 2) >> 1)
        np.testing.assert_array_equal(po, pg, err_msg=f"record {i}")
        assert (g[1::2] & 1).all(), f"record {i} not fully phased"

    err = compute_phase_switch_errors(rephased, vcf)
    # random phasing gives ~50% switch error; on a founder-mosaic panel
    # the PBWT heuristic must recover most of the phase
    assert err["rate"] < 0.25, err


def test_window_phaser_trivial_and_direct():
    """<=1-het samples keep their words; a 2-het sample explainable by a
    seeded haplotype phases to it (PhasingMachineryNew direct phasing)."""
    from xsqueezeit_tpu.utils.phasing import WindowPhaser

    w = 8
    # words (MSB-first over 8 sites)
    h0 = 0b10110010          # hom sample: both haps h0
    h1a, h1b = 0b10110010, 0b10111010   # one het site (bit 3)
    # 2-het sample whose truth is (h1b, hx): het at bits 3 and 0
    hx = 0b10110011
    sa = np.array([h0, h1a, min(h1b, hx)], np.uint64)
    sb = np.array([h0, h1b, max(h1b, hx)], np.uint64)
    ph = WindowPhaser(sa, sb, width=w)
    assert ph.phased.all()
    assert ph.hap_a[0] == h0 and ph.hap_b[0] == h0
    assert {int(ph.hap_a[1]), int(ph.hap_b[1])} == {h1a, h1b}
    # sample 2 is explainable by BOTH h0 (==h1a, count 3: hom seeds twice
    # + the 1-het sample) and h1b (count 1); the most-frequent candidate
    # wins (phasing.hpp:658-661) -> phases as (h0, h0 ^ het)
    het = int(np.uint64(h1b ^ hx))
    assert {int(ph.hap_a[2]), int(ph.hap_b[2])} == {h0, h0 ^ het}


def test_window_phaser_imperfect_match():
    """With no explaining haplotype, the closest known hap (Hamming on hom
    sites) guides the phase (phase_a_sample_as_close_as_possible)."""
    from xsqueezeit_tpu.utils.phasing import WindowPhaser

    guide = 0b11110000
    # sample: het at bits 1,0; hom sites differ from guide at bit 4 only
    a, b = 0b11100000, 0b11100011
    sa = np.array([guide, min(a, b)], np.uint64)
    sb = np.array([guide, max(a, b)], np.uint64)
    ph = WindowPhaser(sa, sb, width=8)
    assert ph.phased.all()
    # het bits take the guide's alleles (0,0) on hap_A
    het = a ^ b
    pha = int(ph.hap_a[1])
    assert (pha & het) == (guide & het)
    assert (pha & ~het) == (a & ~het)  # hom sites untouched


def test_phase_file_windows_recovers_phase(tmp_path):
    from xsqueezeit_tpu.utils.mutate import compute_phase_switch_errors, \
        unphase
    from xsqueezeit_tpu.utils.phasing import phase_file_windows

    vcf = _haplotype_panel_vcf(str(tmp_path / "t.vcf"), n_samples=40,
                               n_records=300, seed=78)
    unphased = str(tmp_path / "u.bcf")
    rephased = str(tmp_path / "w.bcf")
    unphase(vcf, unphased)
    stats = phase_file_windows(unphased, rephased)
    assert stats["records"] == 300 and stats["windows"] == 5

    from xsqueezeit_tpu.io.unified import GtInput
    orig = [r.gt for r in GtInput(vcf)]
    got = [r.gt for r in GtInput(rephased)]
    for i, (o, g) in enumerate(zip(orig, got)):
        po, pg = np.sort(o.reshape(-1, 2) >> 1), np.sort(g.reshape(-1, 2) >> 1)
        np.testing.assert_array_equal(po, pg, err_msg=f"record {i}")
        assert (g[1::2] & 1).all(), f"record {i} not fully phased"

    err = compute_phase_switch_errors(rephased, vcf)
    assert err["rate"] < 0.25, err


def test_stats_tool(tmp_path, capsys):
    vcf = fixtures.random_vcf(str(tmp_path / "s.vcf"), n_samples=30,
                              n_records=120, seed=9)
    xsi = str(tmp_path / "s.xsi")
    cli_main(["-c", "-f", vcf, "-o", xsi, "--variant-block-length", "50"])
    from xsqueezeit_tpu.bench.__main__ import main as bench_main
    assert bench_main(["stats", xsi]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["blocks"] == 3
    assert out["wah_lines"] > 0 and out["sparse_lines"] > 0
    assert out["sparse_line_lengths"]["size"] == out["sparse_lines"]


def test_histogram_helpers():
    from xsqueezeit_tpu.utils.stats import (
        basic_stats,
        extract_histogram,
        histogram_width,
    )

    h = extract_histogram([3, 1, 3, 3, 2])
    assert h == {1: 1, 2: 1, 3: 3}
    assert histogram_width([3, 1, 3, 3, 2]) == 3
    s = basic_stats([1, 2, 3, 4])
    assert s["mean"] == 2.5 and s["max"] == 4 and s["size"] == 4
