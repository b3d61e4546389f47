"""Mixed-ploidy (haploid + diploid interleaved) blocks on the device path.

The reference encodes such blocks record-by-record with pbwt_sort /
pbwt_sort1 over one diploid arrangement (gt_block.hpp:106-151,
interfaces.hpp:318-333); the device formulation slot-duplicates haploid
lines so ONE arrangement chain serves both ploidies and carries the slot
parity through the packed sort keys to extract haploid lines' even-slot
bit subsequence (codec/encoder_jax.encode_block_core_mixed).  These tests
pin byte-identity against the per-record oracle and the decode round trip.
"""
import numpy as np
import pytest

pytest.importorskip("jax")

from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder
from xsqueezeit_tpu.format.constants import WeirdnessStrategy
from tests.gt_synth import make_record


def test_parity_kernel_matches_oracle():
    import jax.numpy as jnp

    from xsqueezeit_tpu.ops import pbwt_jax, pbwt_np

    rng = np.random.default_rng(0)
    for H, L in ((6, 1), (64, 40), (130, 7), (1000, 100)):
        alleles = rng.integers(0, 3, (L, H)).astype(np.int16)
        hap = rng.random(L) < 0.5
        alleles[hap] = np.repeat(alleles[hap][:, 0::2], 2, axis=1)
        alts = rng.integers(1, 3, L).astype(np.int32)
        sorts = rng.random(L) < 0.7
        ys0, par0, af0 = pbwt_np.pbwt_encode_parity(alleles, alts, sorts)
        ys, par, af = pbwt_jax.pbwt_encode_scan_parity(
            jnp.asarray(alleles), jnp.asarray(alts), jnp.asarray(sorts),
            jnp.arange(H, dtype=jnp.int32))
        np.testing.assert_array_equal(np.asarray(ys), ys0)
        np.testing.assert_array_equal(np.asarray(par), par0)
        np.testing.assert_array_equal(np.asarray(af), af0)


def check_identical_and_decode(records, n_samples, mac_threshold=2,
                               ws=WeirdnessStrategy.WS_SPARSE,
                               aet=np.uint16, default_phasing=1):
    kw = dict(block_bcf_lines=10_000, mac_threshold=mac_threshold,
              default_phasing=default_phasing, aet_dtype=aet,
              weirdness_strategy=ws)
    ref = GtBlockEncoder(n_samples, **kw)
    dev = DeviceBlockEncoder(n_samples, **kw)
    for gt, n_alleles in records:
        ref.encode_record(gt, n_alleles)
        dev.encode_record(gt, n_alleles)
    a, b = ref.serialize(), dev.serialize()
    assert a == b, f"payloads differ: {len(a)} vs {len(b)} bytes"

    dec = GtBlockDecoder(b, n_samples, n_samples * 2, aet_dtype=aet)
    pos = 0
    for gt, n_alleles in records:
        dec.seek(pos)
        np.testing.assert_array_equal(
            dec.fill_genotype_array_advance(n_alleles), gt)
        pos += n_alleles - 1


def mixed_records(rng, n_samples, n, hap_every=3, **kw):
    return [make_record(rng, n_samples, haploid=(i % hap_every == 0), **kw)
            for i in range(n)]


def test_mixed_common_variants():
    rng = np.random.default_rng(1)
    check_identical_and_decode(
        mixed_records(rng, 60, 30, p_alt=0.4), 60)


def test_mixed_rare_and_negated():
    rng = np.random.default_rng(2)
    records = (mixed_records(rng, 80, 12, p_alt=0.01)
               + mixed_records(rng, 80, 12, p_alt=0.99, hap_every=2))
    check_identical_and_decode(records, 80, mac_threshold=5)


def test_mixed_multiallelic():
    rng = np.random.default_rng(3)
    check_identical_and_decode(
        mixed_records(rng, 50, 15, n_alts=3, p_alt=0.5), 50)


def test_mixed_missing_sparse_strategy():
    rng = np.random.default_rng(4)
    check_identical_and_decode(
        mixed_records(rng, 50, 20, p_alt=0.3, p_missing=0.08), 50)


def test_mixed_missing_wah_strategy():
    # WAH weirdness tracks are row-length-sensitive: haploid flagged rows
    # must encode n_samples bits, not n_haps (the split host path).
    rng = np.random.default_rng(5)
    check_identical_and_decode(
        mixed_records(rng, 50, 20, p_alt=0.3, p_missing=0.08), 50,
        ws=WeirdnessStrategy.WS_WAH)


def test_mixed_kitchen_sink():
    rng = np.random.default_rng(6)
    records = []
    for i in range(48):
        if i % 7 == 0:
            records.append(make_record(rng, 64, p_alt=0.5, haploid=True))
        elif i % 5 == 0:
            records.append(make_record(rng, 64, n_alts=3, p_alt=0.4,
                                       p_missing=0.03, p_phase_flip=0.05))
        elif i % 3 == 0:
            records.append(make_record(rng, 64, p_alt=0.002, haploid=True))
        else:
            records.append(make_record(rng, 64, p_alt=0.3, p_missing=0.02,
                                       p_eov=0.04, p_phase_flip=0.02))
    check_identical_and_decode(records, 64, mac_threshold=2)
    check_identical_and_decode(records, 64, mac_threshold=2,
                               ws=WeirdnessStrategy.WS_WAH)


def test_mixed_u32_index_type():
    rng = np.random.default_rng(7)
    check_identical_and_decode(
        mixed_records(rng, 40, 18, p_alt=0.3, p_missing=0.05), 40,
        aet=np.uint32)


def test_dispatcher_routes_mixed_to_device(monkeypatch):
    """A mixed-ploidy block must take the device encoder when forced."""
    from xsqueezeit_tpu.codec import compressor as comp_mod
    from xsqueezeit_tpu.codec.compressor import BlockEncodeDispatcher

    calls = []
    orig = DeviceBlockEncoder.serialize

    def spy(self):
        calls.append(self.bcf_lines)
        return orig(self)

    monkeypatch.setattr(DeviceBlockEncoder, "serialize", spy)
    rng = np.random.default_rng(8)
    disp = BlockEncodeDispatcher(
        n_samples=40, block_length=100, mac_threshold=2, default_phasing=1,
        aet_dtype=np.uint16,
        weirdness_strategy=WeirdnessStrategy.WS_SPARSE,
        device_cls=DeviceBlockEncoder, force_device=True)
    records = mixed_records(rng, 40, 20, p_alt=0.4)
    for gt, na in records:
        disp.encode_record(gt, na)
    payload = disp.serialize()
    assert calls == [20]
    ref = GtBlockEncoder(40, block_bcf_lines=100, mac_threshold=2,
                         default_phasing=1, aet_dtype=np.uint16,
                         weirdness_strategy=WeirdnessStrategy.WS_SPARSE)
    for gt, na in records:
        ref.encode_record(gt, na)
    assert payload == ref.serialize()
