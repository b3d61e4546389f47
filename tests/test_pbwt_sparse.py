import numpy as np

from xsqueezeit_tpu.ops import pbwt_np, sparse_np
from tests.reference_impls import pbwt_step_scalar


def test_stable_partition_matches_scalar():
    rng = np.random.default_rng(0)
    a = np.arange(20)
    for _ in range(50):
        key = rng.random(20) < 0.4
        want = pbwt_step_scalar(list(a), list(key))
        got = pbwt_np.stable_partition(a, key)
        assert got.tolist() == want
        a = got


def test_pbwt_sort_chain():
    """A chain of pbwt_sort steps over random columns stays a permutation and
    matches the scalar stable partition through the arrangement."""
    rng = np.random.default_rng(1)
    n_haps = 64
    a = np.arange(n_haps)
    for _ in range(30):
        alleles = rng.integers(0, 2, n_haps)
        gt = ((alleles + 1) << 1).astype(np.int32)
        key = alleles[a] == 1
        want = pbwt_step_scalar(list(a), list(key))
        a = pbwt_np.pbwt_sort(a, gt, 1)
        assert a.tolist() == want
        assert sorted(a.tolist()) == list(range(n_haps))


def test_pbwt_sort_haploid():
    rng = np.random.default_rng(2)
    n_samples = 16
    a = np.arange(n_samples * 2)
    for _ in range(10):
        alleles = rng.integers(0, 2, n_samples)
        gt = ((alleles + 1) << 1).astype(np.int32)
        key = [alleles[h // 2] == 1 for h in a]
        want = pbwt_step_scalar(list(a), key)
        a = pbwt_np.pbwt_sort_haploid(a, gt, 1)
        assert a.tolist() == want


def test_haploid_rearrangement():
    a = np.array([5, 2, 4, 1, 0, 3, 6, 7])
    a1 = pbwt_np.haploid_rearrangement_from_diploid(a)
    # even values in order of appearance, halved
    assert a1.tolist() == [1, 2, 0, 3]


def test_decoder_haploid_sort_matches_encoder():
    """Encoder sorts via column through a//2; decoder reconstructs the same
    arrangement from y (bits in a1 order)."""
    rng = np.random.default_rng(3)
    n_samples = 12
    a = np.arange(n_samples * 2)
    for _ in range(20):
        alleles = rng.integers(0, 2, n_samples)
        gt = ((alleles + 1) << 1).astype(np.int32)
        a1 = pbwt_np.haploid_rearrangement_from_diploid(a)
        y = (alleles[a1] == 1).astype(np.uint8)
        enc = pbwt_np.pbwt_sort_haploid(a, gt, 1)
        dec = pbwt_np.pbwt_sort_bool_haploid(a, y, n_samples)
        assert enc.tolist() == dec.tolist()
        a = enc


def test_sparse_roundtrip():
    for dtype in (np.uint16, np.uint32):
        idx = np.array([3, 17, 999], dtype=np.int64)
        enc = sparse_np.sparse_encode(idx, negated=True, dtype=dtype)
        dec, neg, nxt = sparse_np.sparse_decode(enc)
        assert neg and nxt == 4
        np.testing.assert_array_equal(dec, idx.astype(dtype))

    stream = np.concatenate([
        sparse_np.sparse_encode(np.array([1, 2]), False, np.uint16),
        sparse_np.sparse_encode(np.array([], np.int64), True, np.uint16),
        sparse_np.sparse_encode(np.array([7]), False, np.uint16),
    ])
    offs = sparse_np.sparse_line_offsets(stream, 3)
    assert offs.tolist() == [0, 3, 4, 6]


def test_native_sparse_offsets_matches_python():
    """xsi_sparse_offsets16/32 must walk exactly like both Python paths
    (scalar and binary-lifting) and reject truncated streams the same
    way."""
    import pytest

    native = pytest.importorskip("xsqueezeit_tpu.interop.native")
    fn = native.sparse_offsets_native

    rng = np.random.default_rng(23)
    for dtype in (np.uint16, np.uint32):
        flag = sparse_np.msb(dtype)
        # many short lines (hits the scalar path in numpy terms) plus
        # a large stream (hits binary lifting)
        for n_lines, max_len in ((5, 3), (300, 10), (2000, 40)):
            parts = []
            for _ in range(n_lines):
                k = int(rng.integers(0, max_len))
                neg = bool(rng.integers(0, 2))
                parts.append(sparse_np.sparse_encode(
                    rng.integers(0, 1000, k), neg, dtype))
            stream = np.concatenate(parts) if parts else np.zeros(0, dtype)
            want = sparse_np.sparse_line_offsets(stream, n_lines)
            got = fn(stream, n_lines)
            np.testing.assert_array_equal(got, want, err_msg=str(
                (dtype, n_lines, max_len)))
        # truncated stream: drop the tail so the last line overruns
        stream2 = stream[:-2] if stream.shape[0] > 2 else stream
        with pytest.raises(ValueError, match="truncated"):
            fn(stream2, n_lines)
        # count word larger than the remaining stream
        bad = np.array([flag - 1], dtype)
        with pytest.raises(ValueError, match="truncated"):
            fn(bad, 1)
