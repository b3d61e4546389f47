"""Multi-device (virtual CPU mesh) block-parallel encode/decode tests."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

if len(jax.devices()) < 2:
    pytest.skip("needs multiple (virtual) devices", allow_module_level=True)


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(min(8, len(jax.devices())))


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_sharded_encoder_matches_single_device():
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from xsqueezeit_tpu.codec.encoder_jax import _encode_block_device_compact
    from xsqueezeit_tpu.parallel.shard import make_sharded_encoder

    n_dev = min(4, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("blocks",))
    B, L, H, thr = n_dev * 2, 16, 32, 2
    rng = np.random.default_rng(1)
    alleles = (rng.random((B, L, H)) < 0.4).astype(np.int8)
    alts = np.ones((B, L), np.int32)
    ac = alleles.astype(np.int64).sum(axis=2)
    mac = np.minimum(ac, H - ac)
    is_wah = mac > thr
    negated = ac != mac
    Lw = L  # tiny grids: no bucketing needed in the test
    wah_rows = np.zeros((B, Lw), np.int32)
    sorts_w = np.zeros((B, Lw), bool)
    sparse_rows = np.zeros((B, Lw), np.int32)
    negated_s = np.zeros((B, Lw), bool)
    for b in range(B):
        wr = np.flatnonzero(is_wah[b])
        wah_rows[b, : wr.shape[0]] = wr
        sorts_w[b, : wr.shape[0]] = True
        sr = np.flatnonzero(~is_wah[b])
        sparse_rows[b, : sr.shape[0]] = sr
        negated_s[b, : sr.shape[0]] = negated[b][sr]

    out = make_sharded_encoder(mesh, sparse_cap=4)(
        jnp.asarray(alleles), jnp.asarray(alts), jnp.asarray(is_wah),
        jnp.asarray(negated), jnp.asarray(wah_rows), jnp.asarray(sorts_w),
        jnp.asarray(sparse_rows), jnp.asarray(negated_s))
    for b in range(B):
        single = _encode_block_device_compact(
            jnp.asarray(alleles[b]), jnp.asarray(alts[b]),
            jnp.asarray(is_wah[b]), jnp.asarray(negated[b]),
            jnp.asarray(wah_rows[b]), jnp.asarray(sorts_w[b]),
            jnp.asarray(sparse_rows[b]), jnp.asarray(negated_s[b]), 4)
        np.testing.assert_array_equal(np.asarray(out["wah_words"][b]),
                                      np.asarray(single["wah_words"]))
        np.testing.assert_array_equal(np.asarray(out["wah_len"][b]),
                                      np.asarray(single["wah_len"]))
        np.testing.assert_array_equal(np.asarray(out["sparse_idx"][b]),
                                      np.asarray(single["sparse_idx"]))
