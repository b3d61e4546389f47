"""GT block encode -> serialize -> decode round-trip tests."""
import numpy as np
import pytest

from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder
from xsqueezeit_tpu.format.constants import WeirdnessStrategy
from tests.gt_synth import make_record


def roundtrip(records, n_samples, mac_threshold=1, default_phasing=1,
              aet=np.uint16, ws=WeirdnessStrategy.WS_SPARSE, seek_pattern=None):
    enc = GtBlockEncoder(n_samples, block_bcf_lines=len(records),
                         mac_threshold=mac_threshold,
                         default_phasing=default_phasing, aet_dtype=aet,
                         weirdness_strategy=ws)
    for gt, n_alleles in records:
        enc.encode_record(gt, n_alleles)
    payload = enc.serialize()

    dec = GtBlockDecoder(payload, n_samples, n_samples * 2, aet_dtype=aet)
    outs = []
    pos = 0
    for gt, n_alleles in records:
        dec.seek(pos)
        outs.append(dec.fill_genotype_array_advance(n_alleles))
        pos += n_alleles - 1
    return outs, enc, dec


def assert_same(records, outs):
    for (gt, _), out in zip(records, outs):
        np.testing.assert_array_equal(out, gt)


def test_common_biallelic_phased():
    rng = np.random.default_rng(0)
    records = [make_record(rng, 50, p_alt=0.4) for _ in range(20)]
    outs, _, _ = roundtrip(records, 50)
    assert_same(records, outs)


def test_rare_sparse_lines():
    rng = np.random.default_rng(1)
    records = [make_record(rng, 100, p_alt=0.005) for _ in range(30)]
    outs, enc, _ = roundtrip(records, 100, mac_threshold=4)
    assert enc.sparse_lines, "expected sparse lines"
    assert_same(records, outs)


def test_negated_sparse():
    # REF is the minor allele -> negated sparse lines
    rng = np.random.default_rng(2)
    records = [make_record(rng, 100, p_alt=0.99) for _ in range(10)]
    outs, enc, _ = roundtrip(records, 100, mac_threshold=4)
    assert enc.sparse_lines
    assert_same(records, outs)


def test_multiallelic():
    rng = np.random.default_rng(3)
    records = [make_record(rng, 60, n_alts=3, p_alt=0.5) for _ in range(15)]
    outs, _, _ = roundtrip(records, 60)
    assert_same(records, outs)


def test_multiallelic_negated_sparse():
    # Mostly ALT2: REF becomes minor for that line
    rng = np.random.default_rng(4)
    records = []
    for _ in range(10):
        gt, na = make_record(rng, 80, n_alts=2, p_alt=0.9)
        records.append((gt, na))
    outs, _, _ = roundtrip(records, 80, mac_threshold=30)
    assert_same(records, outs)


@pytest.mark.parametrize("ws", [WeirdnessStrategy.WS_SPARSE, WeirdnessStrategy.WS_WAH])
def test_missing(ws):
    rng = np.random.default_rng(5)
    records = [make_record(rng, 50, p_alt=0.3, p_missing=0.05) for _ in range(20)]
    outs, enc, _ = roundtrip(records, 50, ws=ws)
    assert enc.missing_found
    assert_same(records, outs)


@pytest.mark.parametrize("ws", [WeirdnessStrategy.WS_SPARSE, WeirdnessStrategy.WS_WAH,
                                WeirdnessStrategy.WS_PBWT_WAH])
def test_missing_and_eov(ws):
    rng = np.random.default_rng(6)
    records = [make_record(rng, 50, p_alt=0.3, p_missing=0.04, p_eov=0.06)
               for _ in range(25)]
    outs, enc, _ = roundtrip(records, 50, ws=ws)
    assert enc.missing_found and enc.eov_found
    assert_same(records, outs)


def test_non_uniform_phasing():
    rng = np.random.default_rng(7)
    records = [make_record(rng, 50, p_alt=0.3, p_phase_flip=0.1) for _ in range(20)]
    outs, enc, _ = roundtrip(records, 50)
    assert enc.nup_found
    assert_same(records, outs)


def test_unphased_default():
    rng = np.random.default_rng(8)
    records = [make_record(rng, 50, p_alt=0.3, phased=False) for _ in range(10)]
    outs, _, _ = roundtrip(records, 50, default_phasing=0)
    assert_same(records, outs)


def test_haploid_lines():
    rng = np.random.default_rng(9)
    records = [make_record(rng, 40, p_alt=0.4, haploid=True) for _ in range(15)]
    outs, enc, _ = roundtrip(records, 40)
    assert enc.haploid_found
    assert_same(records, outs)


def test_mixed_haploid_diploid():
    rng = np.random.default_rng(10)
    records = []
    for i in range(24):
        records.append(make_record(rng, 40, p_alt=0.4, haploid=(i % 3 == 0)))
    outs, _, _ = roundtrip(records, 40)
    assert_same(records, outs)


def test_everything_at_once():
    rng = np.random.default_rng(11)
    records = []
    for i in range(40):
        if i % 7 == 0:
            records.append(make_record(rng, 64, p_alt=0.5, haploid=True))
        elif i % 5 == 0:
            records.append(make_record(rng, 64, n_alts=3, p_alt=0.4,
                                       p_missing=0.03, p_phase_flip=0.05))
        elif i % 3 == 0:
            records.append(make_record(rng, 64, p_alt=0.002))
        else:
            records.append(make_record(rng, 64, p_alt=0.3, p_missing=0.02,
                                       p_eov=0.04, p_phase_flip=0.02))
    outs, enc, _ = roundtrip(records, 64, mac_threshold=2)
    assert enc.missing_found and enc.eov_found and enc.nup_found and enc.haploid_found
    assert_same(records, outs)


def test_random_access_backwards_seek():
    rng = np.random.default_rng(12)
    records = [make_record(rng, 50, p_alt=0.3, p_missing=0.02) for _ in range(30)]
    _, enc, dec = roundtrip(records, 50)
    # decode record 20, then 5 (forces reset+replay), then 20 again
    for target in (20, 5, 29, 0, 17):
        dec.seek(target)
        out = dec.fill_genotype_array_advance(2)
        np.testing.assert_array_equal(out, records[target][0])


def test_allele_counts():
    rng = np.random.default_rng(13)
    records = [make_record(rng, 50, n_alts=2, p_alt=0.3) for _ in range(10)]
    _, enc, dec = roundtrip(records, 50)
    dec.reset()
    pos = 0
    for i, (gt, n_alleles) in enumerate(records):
        dec.seek(pos)
        counts = dec.fill_allele_counts_advance(n_alleles)
        alleles = (gt >> 1) - 1
        want = np.bincount(alleles[alleles >= 0], minlength=n_alleles)
        np.testing.assert_array_equal(counts, want)
        pos += n_alleles - 1


def test_uint32_aet():
    rng = np.random.default_rng(14)
    records = [make_record(rng, 30, p_alt=0.01) for _ in range(10)]
    outs, _, _ = roundtrip(records, 30, aet=np.uint32)
    assert_same(records, outs)
