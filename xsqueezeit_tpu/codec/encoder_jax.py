"""Device (JAX) block encoder — the TPU fast path.

Encodes a whole block of diploid records in one fused device pipeline:

    alleles[L, H] --(pbwt_encode_scan: gather/partition per line)--> y[L, H]
    y --(pack_bits + wah_compress_words: vectorised RLE)--> words[L, W]
    alleles --(mask + cumsum compaction)--> sparse indices[L, S]

The host then assembles the byte-exact GT block payload (identical to
GtBlockEncoder.serialize()).  Exception tracks (missing / end-of-vector /
non-uniform phasing) batch through one device dispatch when enough records
are flagged, else encode with vectorized numpy (rare by construction).

The production path is encode_block_core_compact: line classes are
host-known (parse-time carrier counts), so the PBWT chain runs over the
gathered WAH rows and the carrier compaction over the gathered sparse
rows.  Uniformly-haploid blocks run the same kernels at H = n_samples;
MIXED-ploidy blocks take the parity-carrying core
(encode_block_core_mixed).  Only ploidy > 2 is rejected.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pbwt_jax, wah_jax
from ..utils.jaxcache import ensure_compilation_cache
from .encoder_base import (   # noqa: F401  (re-exported for consumers)
    EOV_CODE,
    MISSING_CODE,
    BlockEncoderBase,
    alleles_from_gt,
)

ensure_compilation_cache()


def encode_block_core(alleles, alts, mac_threshold, sparse_cap):
    """Fused device encode body shared by the single-chip and sharded paths.

    alleles: int8[L, H], alts: int32[L], mac_threshold: int32 scalar.

    WAH lines take the β-register PBWT path (pbwt_encode_chunked: one packed
    u32 row sort per sorting line); sparse lines are rare by definition
    (carrier count <= mac_threshold), so their index lists come from a
    K-pass masked-reduction compaction (pure VPU elementwise work, no sort)
    when the capacity is small, else a batched partition sort.
    """
    L, H = alleles.shape
    ac = jnp.sum(alleles.astype(jnp.int32) == alts[:, None], axis=1)
    mac = jnp.minimum(ac, H - ac)
    is_wah = mac > mac_threshold
    negated = ac != mac  # REF is the minor allele (sparse lines store REF)
    sparse_allele = jnp.where(negated, 0, alts)

    if H <= 65535:
        ys, _ = pbwt_jax.pbwt_encode_chunked(alleles, alts, is_wah)
    else:
        a0 = jnp.arange(H, dtype=jnp.int32)
        ys, _ = pbwt_jax.pbwt_encode_scan(alleles, alts, is_wah, a0)
    words = wah_jax.pack_bits(ys)
    # NOTE: ops.wah_pallas.wah_compress_pallas is 3x faster standalone, but
    # in this pipeline the pallas_call fusion barrier costs more than the
    # sort it saves (measured +1.1 ms on the chr20-like block) -- the XLA
    # formulation fuses with pack_bits and the sparse scans.
    wah_words, wah_len = wah_jax.wah_compress_words(words)

    mask = alleles.astype(jnp.int32) == sparse_allele[:, None]
    sparse_len = jnp.sum(mask, axis=1)
    iota = jnp.arange(H, dtype=jnp.int32)
    if sparse_cap <= 32:
        # k-th carrier index = the sole position where cum == k+1 and mask.
        # WAH rows' sparse output is discarded, so zero them first: carrier
        # counts then stay <= sparse_cap <= 32 and the scan runs in int8
        # (4x less cumsum traffic than int32 over [L, H]).
        m8 = jnp.where(is_wah[:, None], 0,
                       mask.astype(jnp.int8))
        code = jnp.cumsum(m8, axis=1)
        code = jnp.where(m8 != 0, code, 0)
        sparse_idx = jnp.stack(
            [jnp.sum(jnp.where(code == k + 1, iota[None, :], 0),
                     axis=1) for k in range(sparse_cap)], axis=1)
    else:
        hb = pbwt_jax._hap_bits(H)
        idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32), (L, H))
        sparse_key = jnp.where(mask, idx, idx | jnp.uint32(1 << hb))
        s = jax.lax.sort(sparse_key, dimension=1,
                         is_stable=False)[:, :sparse_cap]
        sparse_idx = jnp.where((s >> hb) == 0, s, 0).astype(jnp.int32)

    return {
        "is_wah": is_wah,
        "negated": negated,
        "wah_words": wah_words,
        "wah_len": wah_len,
        "sparse_idx": sparse_idx,
        "sparse_len": sparse_len,
    }


def encode_block_core_compact(alleles, alts, is_wah, negated, wah_rows,
                              sorts_w, sparse_cap, sparse_rows=None,
                              negated_s=None):
    """Device encode body with host-known line classes — the production
    fast path.

    The per-record carrier counts taken at parse time (encoder_base
    .encode_record, an L1-resident pass on an already-overlapped host
    thread) make is_wah/negated exact host inputs, so the PBWT chain +
    WAH compression run ONLY over the gathered WAH rows ([Lw, H], a
    near-free monotone row gather) instead of all L lines.  A rare-heavy
    block (1KGP3 chr20 mix: ~55% sparse lines) roughly halves its chain
    work; the sparse compaction stays a full-width single pass.  Returns
    the same dict as encode_block_core but with the WAH grid COMPACTED to
    wah row order (assemble slices [:n_wah]).

    Skipping non-sorting lines is exact: they never update the
    arrangement and their ys rows are never read (reference semantics:
    only sorting lines call pbwt_sort, gt_block.hpp:106-151).
    """
    L, H = alleles.shape
    sparse_allele = jnp.where(negated, 0, alts)

    aw = jnp.take(alleles, wah_rows, axis=0)
    at_w = jnp.take(alts, wah_rows, axis=0)
    if H <= 65535:
        ys, _ = pbwt_jax.pbwt_encode_chunked(aw, at_w, sorts_w)
    else:
        a0 = jnp.arange(H, dtype=jnp.int32)
        ys, _ = pbwt_jax.pbwt_encode_scan(aw, at_w, sorts_w, a0)
    words = wah_jax.pack_bits(ys)
    wah_words, wah_len = wah_jax.wah_compress_words(words)

    # Sparse extraction over the gathered SPARSE rows only (same
    # compaction trick as the chain: the old full-grid form scanned the
    # WAH rows just to zero them).  Falls back to the full grid when the
    # caller has no row list (legacy mesh/test paths).
    if sparse_rows is not None:
        sp = jnp.take(alleles, sparse_rows, axis=0)
        sp_alts = jnp.take(alts, sparse_rows, axis=0)
        sp_allele = jnp.where(negated_s, 0, sp_alts)
        mask = sp.astype(jnp.int32) == sp_allele[:, None]
        Lr = sp.shape[0]
        zero_wah = None     # rows are sparse by construction
    else:
        sparse_allele = jnp.where(negated, 0, alts)
        mask = alleles.astype(jnp.int32) == sparse_allele[:, None]
        Lr = L
        zero_wah = is_wah
    sparse_len = jnp.sum(mask, axis=1)
    iota = jnp.arange(H, dtype=jnp.int32)
    if sparse_cap <= 32:
        m8 = mask.astype(jnp.int8)
        if zero_wah is not None:
            m8 = jnp.where(zero_wah[:, None], 0, m8)
        code = jnp.cumsum(m8, axis=1)
        code = jnp.where(m8 != 0, code, 0)
        sparse_idx = jnp.stack(
            [jnp.sum(jnp.where(code == k + 1, iota[None, :], 0),
                     axis=1) for k in range(sparse_cap)], axis=1)
    else:
        hb = pbwt_jax._hap_bits(H)
        idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32), (Lr, H))
        sparse_key = jnp.where(mask, idx, idx | jnp.uint32(1 << hb))
        s = jax.lax.sort(sparse_key, dimension=1,
                         is_stable=False)[:, :sparse_cap]
        sparse_idx = jnp.where((s >> hb) == 0, s, 0).astype(jnp.int32)

    return {
        "wah_words": wah_words,
        "wah_len": wah_len,
        "sparse_idx": sparse_idx,
        "sparse_len": sparse_len,
    }


@functools.partial(jax.jit, static_argnames=("sparse_cap",))
def _encode_block_device_compact(alleles, alts, is_wah, negated, wah_rows,
                                 sorts_w, sparse_rows, negated_s,
                                 sparse_cap):
    return encode_block_core_compact(alleles, alts, is_wah, negated,
                                     wah_rows, sorts_w, sparse_cap,
                                     sparse_rows=sparse_rows,
                                     negated_s=negated_s)


def encode_block_core_mixed(alleles, alts, hap_line, mac_threshold,
                            sparse_cap):
    """Device encode body for MIXED-ploidy blocks (haploid + diploid
    records interleaved, e.g. a chrX PAR boundary block).

    alleles: int8/int16[L, 2N] allele codes with haploid lines in
    SLOT-DUPLICATED form (each sample's allele in both of its slots), so
    ONE arrangement chain serves both ploidies: the partition predicate
    `alleles[a] == alt` evaluates per sample through the diploid
    arrangement, exactly the reference's pbwt_sort1 -> pbwt_sort_<T, 2>
    (internal_gt_record.hpp:33-59).  hap_line: bool[L].

    Per-line outputs follow the host GtBlockEncoder semantics:
      - counts: duplication doubles a haploid line's allele count, so the
        effective (ac, length) halve where hap_line;
      - WAH bits of a haploid line are the even-slot subsequence of the
        arrangement-ordered bits (= haploid_rearrangement_from_diploid
        order), extracted with the parity payload bit + one batched sort;
      - sparse indices are NATURAL-order; haploid lines mask odd slots so
        carriers land at 2s, halved by the host assembler.

    Two WAH word grids come back (full 2N width and N width); `assemble`
    picks per line.  Byte-exact vs GtBlockEncoder (tests/test_encoder_mixed).
    """
    L, H = alleles.shape
    N = H // 2
    iota = jnp.arange(H, dtype=jnp.int32)
    even_slot = (iota & 1) == 0

    ac2 = jnp.sum(alleles.astype(jnp.int32) == alts[:, None], axis=1)
    ac = jnp.where(hap_line, ac2 >> 1, ac2)
    len_eff = jnp.where(hap_line, N, H)
    mac = jnp.minimum(ac, len_eff - ac)
    is_wah = mac > mac_threshold
    negated = ac != mac
    sparse_allele = jnp.where(negated, 0, alts)

    a0 = jnp.arange(H, dtype=jnp.int32)
    ys, par, _ = pbwt_jax.pbwt_encode_scan_parity(alleles, alts, is_wah, a0)

    words = wah_jax.pack_bits(ys)
    wah_words, wah_len = wah_jax.wah_compress_words(words)

    # Even-slot subsequence per line: one batched u32 sort
    # (key = destination-among-evens, payload = bit; odd slots sink past N).
    even_ar = (par == 0).astype(jnp.int32)
    dest = jnp.cumsum(even_ar, axis=1) - even_ar   # rank among evens
    key = jnp.where(par == 0, dest, H).astype(jnp.uint32)
    hap_ys = (jax.lax.sort((key << 1) | ys.astype(jnp.uint32),
                           dimension=1, is_stable=False)[:, :N]
              & jnp.uint32(1)).astype(jnp.uint8)
    hap_words = wah_jax.pack_bits(hap_ys)
    hap_wah_words, hap_wah_len = wah_jax.wah_compress_words(hap_words)

    mask = (alleles.astype(jnp.int32) == sparse_allele[:, None]) \
        & (~hap_line[:, None] | even_slot[None, :])
    sparse_len = jnp.sum(mask, axis=1)
    hb = pbwt_jax._hap_bits(H)
    idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32), (L, H))
    sparse_key = jnp.where(mask, idx, idx | jnp.uint32(1 << hb))
    s = jax.lax.sort(sparse_key, dimension=1, is_stable=False)[:, :sparse_cap]
    sparse_idx = jnp.where((s >> hb) == 0, s, 0).astype(jnp.int32)

    return {
        "is_wah": is_wah,
        "negated": negated,
        "wah_words": wah_words,
        "wah_len": wah_len,
        "hap_wah_words": hap_wah_words,
        "hap_wah_len": hap_wah_len,
        "sparse_idx": sparse_idx,
        "sparse_len": sparse_len,
    }


@functools.partial(jax.jit, static_argnames=("sparse_cap",))
def _encode_block_device_mixed(alleles, alts, hap_line, mac_threshold,
                               sparse_cap):
    return encode_block_core_mixed(alleles, alts, hap_line, mac_threshold,
                                   sparse_cap)


@functools.partial(jax.jit, static_argnames=("sparse_cap",))
def _encode_block_device(alleles, alts, mac_threshold, sparse_cap):
    """Fused device encode of one block.  Exception flags are derived on
    host per RECORD in serialize() (cheap vectorized numpy); the track
    BITS encode on device in a second batched call (_encode_tracks_device)
    when enough records are flagged."""
    return encode_block_core(alleles, alts, mac_threshold, sparse_cap)


@functools.partial(jax.jit, static_argnames=("cap",))
def _encode_tracks_device(bits, cap):
    """Batched WAH + sparse encode of exception-track bit rows.

    bits: uint8[R, H], one row per flagged (record, track-type) pair —
    missing, end-of-vector and phase rows batch through ONE dispatch.
    Replaces the round-2 per-record host loop (VERDICT weak #3): a
    sprinkle-missing workload (reference sprinkle_missing_xcf,
    xcf.cpp:444-578) flags every record, and R sequential host WAH
    encodes would serialize the pipeline.

    Returns (wah_words u16[R, W] front-packed, wah_len i32[R],
    sparse_idx i32[R, cap], sparse_len i32[R]); byte-identical to
    wah_np.wah_encode / sparse_np.sparse_encode per row (same guarantees
    as the main matrix, pinned by the golden-byte tests).
    """
    R, H = bits.shape
    words = wah_jax.pack_bits(bits.astype(jnp.int32))
    wah_words, wah_len = wah_jax.wah_compress_words(words)
    if cap == 0:   # WAH-only tracks: skip the sparse sort entirely
        return (wah_words, wah_len, jnp.zeros((R, 0), jnp.int32),
                jnp.zeros((R,), jnp.int32))
    mask = bits != 0
    hb = pbwt_jax._hap_bits(H)
    idx = jnp.broadcast_to(jnp.arange(H, dtype=jnp.uint32), (R, H))
    key = jnp.where(mask, idx, idx | jnp.uint32(1 << hb))
    s = jax.lax.sort(key, dimension=1, is_stable=False)[:, :cap]
    sparse_idx = jnp.where((s >> hb) == 0, s, 0).astype(jnp.int32)
    sparse_len = jnp.sum(mask, axis=1)
    return wah_words, wah_len, sparse_idx, sparse_len


class DeviceBlockEncoder(BlockEncoderBase):
    """Block encoder driving the JAX pipeline; host assembles the payload
    (prepare/assemble/track machinery in codec/encoder_base)."""

    use_device_tracks = True

    def serialize(self) -> bytes:
        return self.serialize_prepared(self.prepare())

    def serialize_prepared(self, prep: dict) -> bytes:
        sparse_cap = max(int(self.mac_threshold), 1)
        L = prep["L"]
        if prep["mixed"]:
            out = _encode_block_device_mixed(
                jnp.asarray(prep["alleles_p"]), jnp.asarray(prep["alts_p"]),
                jnp.asarray(prep["hap_line_p"]),
                jnp.int32(self.mac_threshold), sparse_cap)
            out = {k: np.asarray(v)[:L] for k, v in out.items()}
        else:
            out = _encode_block_device_compact(
                jnp.asarray(prep["alleles_p"]), jnp.asarray(prep["alts_p"]),
                jnp.asarray(prep["is_wah_p"]), jnp.asarray(prep["negated_p"]),
                jnp.asarray(prep["wah_rows_p"]), jnp.asarray(prep["sorts_w"]),
                jnp.asarray(prep["sparse_rows_p"]),
                jnp.asarray(prep["negated_s"]), sparse_cap)
            n_wah, n_sparse = prep["n_wah"], prep["n_sparse"]
            out = {
                "is_wah": prep["is_wah"],
                "negated": prep["negated"],
                "wah_compact": True,
                "sparse_compact": True,
                "wah_words": np.asarray(out["wah_words"])[:n_wah],
                "wah_len": np.asarray(out["wah_len"])[:n_wah],
                "sparse_idx": np.asarray(out["sparse_idx"])[:n_sparse],
                "sparse_len": np.asarray(out["sparse_len"])[:n_sparse],
            }
        return self.assemble(out, prep)

