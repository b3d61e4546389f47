"""Pallas staged-shift partition kernels vs the sort-based oracles.

Runs in interpret mode on the CPU test backend; the same kernels execute
compiled on TPU (validated by bench.py and the device e2e tests).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from xsqueezeit_tpu.ops import pbwt_jax, pbwt_pallas


def _encode_scan(x, sorts, H):
    L = x.shape[0]
    return pbwt_jax.pbwt_encode_scan(
        jnp.asarray(x), jnp.asarray(np.ones(L, np.int32)),
        jnp.asarray(sorts), jnp.asarray(np.arange(H, dtype=np.int32)))


def test_chain_decode_interpret_matches_scan():
    rng = np.random.default_rng(21)
    C, H = 16, 300
    hp = pbwt_pallas._ceil_to(H, 128)
    n_ch = 3
    L = n_ch * C
    ps = rng.choice([0.02, 0.3, 0.6, 0.9], size=L)
    x = (rng.random((L, H)) < ps[:, None]).astype(np.int8)
    sorts = rng.random(L) < 0.7
    ys, _ = _encode_scan(x, sorts, H)
    ys = np.asarray(ys)

    yc = np.zeros((n_ch, C, hp), np.int32)
    yc[:, :, :H] = ys.reshape(n_ch, C, H)
    ss = sorts.reshape(n_ch, C).astype(np.int32)
    p_fin = np.asarray(pbwt_pallas.chain_decode(
        jnp.asarray(yc), jnp.asarray(ss), C, H,
        interpret=True))[:, -1, :H]

    # oracle: replay each chunk with numpy partitions
    iota = np.arange(H)
    for t in range(n_ch):
        p = iota.astype(np.uint64) << 16
        for j in range(C):
            y = ys[t * C + j].astype(np.uint64)
            p = p | (y << j)
            if sorts[t * C + j]:
                p = np.concatenate([p[y == 0], p[y == 1]])
        np.testing.assert_array_equal(p_fin[t], p.astype(np.uint32),
                                      err_msg=f"chunk {t}")


def test_chain_encode_interpret_matches_scan():
    rng = np.random.default_rng(22)
    C, H = 16, 257
    hp = pbwt_pallas._ceil_to(H, 128)
    n_ch = 4
    L = n_ch * C
    ps = rng.choice([0.05, 0.4, 0.8], size=L)
    x = (rng.random((L, H)) < ps[:, None]).astype(np.int8)
    sorts = rng.random(L) < 0.8
    want, _ = _encode_scan(x, sorts, H)

    # build chunk-start registers exactly as pbwt_encode_chunked does
    xb = (x == 1).astype(np.uint32)
    xc = xb.reshape(n_ch, C, H)
    jsh = np.arange(C, dtype=np.uint32)
    bhat = np.sum(xc << jsh[None, :, None], axis=1)
    ss = sorts.reshape(n_ch, C).astype(np.uint32)
    sh = np.cumsum(ss, axis=1) - ss
    T = np.sum(np.where(ss[:, :, None] != 0, xc << sh[:, :, None], 0), axis=1)
    b = pbwt_jax._hap_bits(H)
    _, r_starts = pbwt_jax._rank_chain(
        jnp.asarray(T.astype(np.uint32)),
        jnp.arange(H, dtype=jnp.int32), b)
    r_starts = np.asarray(r_starts)
    q0 = np.zeros((n_ch, hp), np.uint32)
    for t in range(n_ch):
        q0[t, r_starts[t]] = bhat[t]
    got = np.asarray(pbwt_pallas.chain_encode(
        jnp.asarray(q0), jnp.asarray(ss.astype(np.int32)), C, H,
        interpret=True))[:, :, :H].reshape(L, H)
    np.testing.assert_array_equal(got, np.asarray(want).astype(np.int32))


def test_wah_expand_pallas_interpret_matches_xla():
    from xsqueezeit_tpu.ops import wah_jax, wah_np
    from xsqueezeit_tpu.ops.wah_pallas import wah_expand_pallas
    rng = np.random.default_rng(23)
    for H in (31, 300, 1001):
        L = 24
        W = wah_jax.n_words_for(H)
        ps = rng.choice([0.0, 0.01, 0.3, 0.9, 1.0], size=L)
        bits = (rng.random((L, H)) < ps[:, None]).astype(np.uint8)
        stream = np.concatenate([wah_np.wah_encode(b) for b in bits])
        padded = np.concatenate([stream, np.zeros(7, np.uint16)])
        want = np.asarray(wah_jax.wah_expand_stream(
            jnp.asarray(padded), L + 3, W))
        got = np.asarray(wah_expand_pallas(
            jnp.asarray(padded), L + 3, W, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"H={H}")


def test_wah_compress_pallas_interpret_matches_xla():
    from xsqueezeit_tpu.ops import wah_jax
    from xsqueezeit_tpu.ops.wah_pallas import wah_compress_pallas
    rng = np.random.default_rng(24)
    for H in (31, 300, 5008):
        L = 24
        ps = rng.choice([0.0, 0.01, 0.3, 0.9, 1.0], size=L)
        bits = (rng.random((L, H)) < ps[:, None]).astype(np.uint8)
        words = wah_jax.pack_bits(jnp.asarray(bits))
        want_w, want_n = wah_jax.wah_compress_words(words)
        got_w, got_n = wah_compress_pallas(words, words.shape[1],
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))
        np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w),
                                      err_msg=f"H={H}")


def test_wah_compress_pallas_counter_saturation():
    from xsqueezeit_tpu.ops.wah_pallas import wah_compress_pallas
    from xsqueezeit_tpu.ops import wah_jax
    n = (16383 + 5) * 15
    bits = np.zeros((2, n), np.uint8)
    bits[1] = 1
    words = wah_jax.pack_bits(jnp.asarray(bits))
    got_w, got_n = wah_compress_pallas(words, words.shape[1], interpret=True)
    assert np.asarray(got_n).tolist() == [2, 2]
    assert np.asarray(got_w)[0, :2].tolist() == [0x8000 | 16383, 0x8000 | 5]
    assert np.asarray(got_w)[1, :2].tolist() == [0xC000 | 16383, 0xC000 | 5]


def test_chunked_paths_interpret_mode(monkeypatch):
    """Full pbwt_{encode,decode}_chunked through the Pallas branch
    (interpreter mode on CPU) vs the scan oracles -- covers the two-epoch
    decode kernel + mid-chunk arrangement composition."""
    from xsqueezeit_tpu.ops import pbwt_jax as pj
    monkeypatch.setenv("XSI_PALLAS", "interpret")
    pj._use_pallas.cache_clear()
    pj._pallas_interpret.cache_clear()
    try:
        rng = np.random.default_rng(33)
        for L, H in ((48, 300), (70, 130)):
            ps = rng.choice([0.02, 0.3, 0.7], size=L)
            x = (rng.random((L, H)) < ps[:, None]).astype(np.int8)
            alts = np.ones(L, np.int32)
            sorts = rng.random(L) < 0.8
            a0 = np.arange(H, dtype=np.int32)
            want_y, want_a = pj.pbwt_encode_scan(
                jnp.asarray(x), jnp.asarray(alts), jnp.asarray(sorts),
                jnp.asarray(a0))
            got_y, got_a = pj.pbwt_encode_chunked(
                jnp.asarray(x), jnp.asarray(alts), jnp.asarray(sorts))
            np.testing.assert_array_equal(np.asarray(got_y),
                                          np.asarray(want_y))
            np.testing.assert_array_equal(np.asarray(got_a),
                                          np.asarray(want_a))
            vals, a_fin = pj.pbwt_decode_chunked(got_y, jnp.asarray(sorts))
            np.testing.assert_array_equal(np.asarray(vals), (x == 1))
            np.testing.assert_array_equal(np.asarray(a_fin),
                                          np.asarray(want_a))
    finally:
        pj._use_pallas.cache_clear()
        pj._pallas_interpret.cache_clear()


def test_decode_wah_and_scan_interpret_mode(monkeypatch):
    """The fused decode entry honors XSI_PALLAS=interpret end to end."""
    from xsqueezeit_tpu.ops import pbwt_jax as pj
    from xsqueezeit_tpu.ops import wah_np, wah_jax
    from xsqueezeit_tpu.codec import decoder_jax
    monkeypatch.setenv("XSI_PALLAS", "interpret")
    pj._use_pallas.cache_clear()
    pj._pallas_interpret.cache_clear()
    try:
        rng = np.random.default_rng(44)
        H, L = 200, 32
        W = wah_jax.n_words_for(H)
        bits = (rng.random((L, H)) < 0.4).astype(np.uint8)
        ys, _ = pj.pbwt_encode_scan(
            jnp.asarray(bits.astype(np.int8)),
            jnp.asarray(np.ones(L, np.int32)),
            jnp.asarray(np.ones(L, bool)),
            jnp.asarray(np.arange(H, dtype=np.int32)))
        stream = np.concatenate(
            [wah_np.wah_encode(r) for r in np.asarray(ys)]
            + [np.zeros(W + 1, np.uint16)])
        vals = decoder_jax._decode_wah_and_scan(
            jnp.asarray(stream), jnp.asarray(np.ones(L, bool)), H, W)
        np.testing.assert_array_equal(np.asarray(vals), bits)
    finally:
        pj._use_pallas.cache_clear()
        pj._pallas_interpret.cache_clear()


def test_wah_expand_pallas_wide_lines_delegate():
    """wp > 1024 (HRC-class widths) routes to the XLA expansion; results
    must be identical to the per-line oracle either way."""
    import numpy as np
    import jax.numpy as jnp
    from xsqueezeit_tpu.ops import wah_np
    from xsqueezeit_tpu.ops.wah_pallas import wah_expand_pallas

    rng = np.random.default_rng(41)
    n_bits, n_lines = 20000, 6          # w = 1334 > 1024 -> delegate
    w = (n_bits + 14) // 15
    streams, want = [], []
    for _ in range(n_lines):
        bits = (rng.random(n_bits) < rng.choice([0.01, 0.5, 0.99])).astype(np.uint8)
        streams.append(wah_np.wah_encode(bits))
        want.append(bits)
    stream = np.concatenate(streams)
    out = np.asarray(wah_expand_pallas(jnp.asarray(stream), n_lines, w,
                                       interpret=True))
    got = wah_np.unpack_words(out.astype(np.uint16), w * 15)[:, :n_bits]
    np.testing.assert_array_equal(got, np.stack(want))


def test_wah_expand_rows_pallas_interpret_matches_oracle():
    """Row-blocked expansion (the wide-regime / HRC kernel): any width,
    within-row shifts only.  Checked against the XLA formulation at HRC
    width (w=4332, the 64976-hap grid) and narrow/odd widths, including
    over-padded streams, all-zero/all-one fills and counter saturation."""
    from xsqueezeit_tpu.ops import wah_jax, wah_np
    from xsqueezeit_tpu.ops.wah_pallas import wah_expand_rows_pallas
    rng = np.random.default_rng(29)
    for H, L in ((64976, 6), (31, 24), (1001, 16), (300, 24)):
        W = wah_jax.n_words_for(H)
        ps = rng.choice([0.0, 0.005, 0.3, 0.9, 1.0], size=L)
        bits = (rng.random((L, H)) < ps[:, None]).astype(np.uint8)
        stream = np.concatenate([wah_np.wah_encode(b) for b in bits])
        padded = np.concatenate([stream, np.zeros(7, np.uint16)])
        want = np.asarray(wah_jax.wah_expand_stream(
            jnp.asarray(padded), L + 2, W))
        got = np.asarray(wah_expand_rows_pallas(
            jnp.asarray(padded), L + 2, W, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"H={H}")


def test_wah_expand_wide_regime_routes_to_rows_kernel():
    """wah_expand_pallas must delegate wp>1024 grids to the row-blocked
    kernel and still equal the oracle (the HRC decode path)."""
    from xsqueezeit_tpu.ops import wah_jax, wah_np
    from xsqueezeit_tpu.ops.wah_pallas import wah_expand_pallas
    rng = np.random.default_rng(30)
    H, L = 20000, 8
    W = wah_jax.n_words_for(H)
    ps = rng.choice([0.0, 0.01, 0.5, 1.0], size=L)
    bits = (rng.random((L, H)) < ps[:, None]).astype(np.uint8)
    stream = np.concatenate([wah_np.wah_encode(b) for b in bits])
    want = np.asarray(wah_jax.wah_expand_stream(jnp.asarray(stream), L, W))
    got = np.asarray(wah_expand_pallas(jnp.asarray(stream), L, W,
                                       interpret=True))
    np.testing.assert_array_equal(got, want)


def test_full_encoder_serialize_interpret_mode(monkeypatch):
    """The production serialize (compact cores incl. gathered WAH/sparse
    rows) through the Pallas branch in interpreter mode must stay
    byte-identical to the per-record oracle."""
    from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
    from xsqueezeit_tpu.ops import pbwt_jax as pj
    from tests.gt_synth import make_record

    monkeypatch.setenv("XSI_PALLAS", "interpret")
    pj._use_pallas.cache_clear()
    pj._pallas_interpret.cache_clear()
    try:
        rng = np.random.default_rng(66)
        records = []
        for i in range(30):
            p = [0.01, 0.3, 0.6, 0.99][i % 4]
            records.append(make_record(rng, 70, p_alt=p,
                                       p_missing=0.02 if i % 6 == 0 else 0))
        kw = dict(block_bcf_lines=100, mac_threshold=3, default_phasing=1,
                  aet_dtype=np.uint16)
        ref = GtBlockEncoder(70, **kw)
        dev = DeviceBlockEncoder(70, **kw)
        for gt, na in records:
            ref.encode_record(gt, na)
            dev.encode_record(gt, na)
        assert ref.serialize() == dev.serialize()
    finally:
        pj._use_pallas.cache_clear()
        pj._pallas_interpret.cache_clear()
