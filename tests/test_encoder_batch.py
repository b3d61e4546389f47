"""Batched ingest (BlockEncoderBase.encode_records) vs per-record
encode_record: identical block payloads.

The batched path is the production parse-segment entry on the device
encoder (compressor._encode / submit feed whole segments); it must append
exactly the state n scalar calls would (rows, exception stats, ALT counts,
phase flags), so serialize() bytes are pinned against the scalar path for
every record class."""
import numpy as np
import pytest

pytest.importorskip("jax")

from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
from xsqueezeit_tpu.format.constants import WeirdnessStrategy
from tests.gt_synth import make_record


def _encoders(n_samples, **over):
    kw = dict(block_bcf_lines=10_000, mac_threshold=3,
              default_phasing=1, aet_dtype=np.uint16,
              weirdness_strategy=WeirdnessStrategy.WS_SPARSE)
    kw.update(over)
    return (DeviceBlockEncoder(n_samples, **kw),
            DeviceBlockEncoder(n_samples, **kw))


def _segment(records):
    """Flatten records into the parse-segment layout (gt_all, offs, na)."""
    gt_all = np.ascontiguousarray(
        np.concatenate([gt for gt, _ in records]).astype(np.int32))
    offs = np.zeros(len(records) + 1, np.int64)
    np.cumsum([gt.shape[0] for gt, _ in records], out=offs[1:])
    na = np.array([n for _, n in records], np.int32)
    return gt_all, offs, na


def check_batch_identical(records, n_samples, **over):
    scalar, batched = _encoders(n_samples, **over)
    for gt, na in records:
        scalar.encode_record(np.asarray(gt, np.int32), na)
    gt_all, offs, na = _segment(records)
    batched.encode_records(gt_all, offs, na, 0, len(records))
    a, b = scalar.serialize(), batched.serialize()
    assert a == b, f"payloads differ: {len(a)} vs {len(b)} bytes"


def test_plain_diploid():
    rng = np.random.default_rng(0)
    check_batch_identical(
        [make_record(rng, 60, p_alt=0.4) for _ in range(30)], 60)


def test_missing_eov_phase():
    rng = np.random.default_rng(1)
    recs = [make_record(rng, 40, p_alt=0.3, p_missing=0.05, p_eov=0.03,
                        p_phase_flip=0.1) for _ in range(25)]
    check_batch_identical(recs, 40)


def test_multiallelic_mix():
    rng = np.random.default_rng(2)
    recs = ([make_record(rng, 50, n_alts=3, p_alt=0.5) for _ in range(8)]
            + [make_record(rng, 50, p_alt=0.01) for _ in range(8)]
            + [make_record(rng, 50, n_alts=2, p_alt=0.9) for _ in range(8)])
    check_batch_identical(recs, 50)


def test_mixed_ploidy_segments():
    """Width changes mid-segment exercise the uniform-run splitter."""
    rng = np.random.default_rng(3)
    recs = ([make_record(rng, 30, p_alt=0.3) for _ in range(5)]
            + [make_record(rng, 30, haploid=True, p_alt=0.3)
               for _ in range(5)]
            + [make_record(rng, 30, p_alt=0.2, p_missing=0.02)
               for _ in range(5)])
    check_batch_identical(recs, 30)


def test_unphased_default():
    rng = np.random.default_rng(4)
    recs = [make_record(rng, 45, phased=False, p_phase_flip=0.2)
            for _ in range(20)]
    check_batch_identical(recs, 45, default_phasing=0)


def test_lo_hi_window():
    """encode_records honors the [lo, hi) window of a larger segment."""
    rng = np.random.default_rng(5)
    recs = [make_record(rng, 35, p_alt=0.3, p_missing=0.02)
            for _ in range(20)]
    scalar, batched = _encoders(35)
    for gt, na in recs[4:16]:
        scalar.encode_record(np.asarray(gt, np.int32), na)
    gt_all, offs, na = _segment(recs)
    batched.encode_records(gt_all, offs, na, 4, 16)
    assert scalar.serialize() == batched.serialize()


def test_split_across_calls():
    """Two segment calls append exactly like one (block-boundary split)."""
    rng = np.random.default_rng(6)
    recs = [make_record(rng, 25, p_alt=0.4, p_phase_flip=0.05)
            for _ in range(18)]
    scalar, batched = _encoders(25)
    for gt, na in recs:
        scalar.encode_record(np.asarray(gt, np.int32), na)
    gt_all, offs, na = _segment(recs)
    batched.encode_records(gt_all, offs, na, 0, 7)
    batched.encode_records(gt_all, offs, na, 7, 18)
    assert scalar.serialize() == batched.serialize()


# ---------------------------------------------------------------------------
# Native one-pass ingest (gt_encoder.cpp xsi_ingest_codes) vs numpy oracle
# ---------------------------------------------------------------------------
native = pytest.importorskip("xsqueezeit_tpu.interop.native")


def _numpy_ingest(gt_mat, na_arr, dp, check_phase):
    from xsqueezeit_tpu.codec.encoder_base import (
        EOV_CODE,
        MISSING_CODE,
        alleles_from_gt,
    )
    codes = alleles_from_gt(gt_mat, int(na_arr.max(initial=2)))
    miss = (codes == MISSING_CODE).sum(1)
    eov = (codes == EOV_CODE).sum(1)
    alt_offs = np.zeros(len(na_arr) + 1, np.int64)
    np.cumsum(np.maximum(na_arr - 1, 0), out=alt_offs[1:])
    alt_flat = np.zeros(int(alt_offs[-1]), np.int64)
    for j, a in enumerate(na_arr):
        a = int(a)
        if a == 2:
            alt_flat[alt_offs[j]] = np.count_nonzero(codes[j] == 1)
        elif a > 2:
            alt_flat[alt_offs[j]:alt_offs[j + 1]] = np.bincount(
                np.maximum(codes[j], 0), minlength=a)[1:a]
    W = gt_mat.shape[1]
    second = (np.arange(W) & 1).astype(bool)
    nup = (((gt_mat & 1) != dp) & second).any(1) if check_phase \
        else np.zeros(len(na_arr), bool)
    return codes, miss, eov, alt_flat, alt_offs, nup


@pytest.mark.parametrize("dp", [0, 1])
@pytest.mark.parametrize("check_phase", [True, False])
def test_native_ingest_matches_numpy(dp, check_phase):
    try:
        native.build_native()
    except Exception:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    recs = ([make_record(rng, 48, p_alt=0.3, p_missing=0.04, p_eov=0.02,
                         p_phase_flip=0.1) for _ in range(10)]
            + [make_record(rng, 48, n_alts=3, p_alt=0.5) for _ in range(6)]
            + [make_record(rng, 48, phased=False) for _ in range(4)])
    gt_mat = np.stack([g for g, _ in recs]).astype(np.int32)
    na_arr = np.array([n for _, n in recs], np.int64)
    got = native.ingest_codes_native(gt_mat, na_arr, dp, check_phase)
    want = _numpy_ingest(gt_mat, na_arr, dp, check_phase)
    for g, w, name in zip(got, want, ("codes", "miss", "eov", "alt_flat",
                                      "alt_offs", "nup")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)


def test_native_ingest_payload_identical(monkeypatch):
    """Payload bytes with the native ingest forced == numpy ingest =="""
    try:
        native.build_native()
    except Exception:
        pytest.skip("native toolchain unavailable")
    from xsqueezeit_tpu.codec import encoder_base
    rng = np.random.default_rng(12)
    recs = ([make_record(rng, 40, p_alt=0.3, p_missing=0.03,
                         p_phase_flip=0.06) for _ in range(12)]
            + [make_record(rng, 40, haploid=True, p_alt=0.4)
               for _ in range(6)])
    gt_all, offs, na = _segment(recs)
    monkeypatch.setattr(encoder_base, "_NAT_INGEST",
                        native.ingest_codes_native)
    enc_nat = _encoders(40)[0]
    enc_nat.encode_records(gt_all, offs, na, 0, len(recs))
    monkeypatch.setattr(encoder_base, "_NAT_INGEST", None)
    enc_np = _encoders(40)[0]
    enc_np.encode_records(gt_all, offs, na, 0, len(recs))
    assert enc_nat.serialize() == enc_np.serialize()
