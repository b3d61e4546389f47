"""PBWT arrangement scan — JAX device kernels.

The PBWT stable partition is sequential along the variant axis but fully
vectorizable along the haplotype axis.  It runs as a `lax.scan` over a
block's binary lines carrying the arrangement `a` (int32[H]): per step one
gather (column through `a`), one cumulative sum (destination indices of the
stable partition), and one scatter.  Block independence (the arrangement
re-seeds to iota every block, header flag iota_ppa) supplies cross-device
parallelism; see parallel/shard.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def partition_destinations(y: jnp.ndarray) -> jnp.ndarray:
    """Destination index of each element under a stable partition by y.

    y: bool/int[H] in arrangement order.  Zeros keep order at the front,
    ones are appended in order.
    """
    y = y.astype(jnp.int32)
    zeros_before = jnp.cumsum(1 - y) - (1 - y)
    n_zeros = jnp.sum(1 - y)
    ones_before = jnp.cumsum(y) - y
    return jnp.where(y == 0, zeros_before, n_zeros + ones_before)


def stable_partition(a: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    dest = partition_destinations(y)
    return jnp.zeros_like(a).at[dest].set(a)


ENCODE_CHUNK = 16  # sorting lines per batched sort (prefix key < 2^16)


@functools.partial(jax.jit, static_argnames=())
def pbwt_encode_scan(alleles: jnp.ndarray, alts: jnp.ndarray,
                     sorts: jnp.ndarray, a0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bits-through-arrangement for every line of a block.

    alleles: int8/int16[L, H]  allele index per line per haplotype slot
             (missing -> -1, end-of-vector -> -2)
    alts:    int32[L]          target ALT per binary line
    sorts:   bool[L]           whether the line updates the arrangement (WAH)
    a0:      int32[H]          initial arrangement (iota at block start)

    Returns (y uint8[L, H] bits in arrangement order, a_final int32[H]).

    TPU formulation: the PBWT arrangement after sorting lines b1..bk is the
    stable lexicographic order of (bk, ..., b1, prior rank) -- a sort by the
    haplotypes' bit-history.  A whole chunk of C lines therefore encodes
    with ONE batched `lax.sort` keyed on (history prefix, chunk-start rank)
    with the raw column bits as payload: the sorted payload IS the line's
    arrangement-ordered bit vector.  No per-line gathers or scatters; the
    only scatter is one rank inversion per chunk.
    """
    L, H = alleles.shape
    C = ENCODE_CHUNK
    x = (alleles.astype(jnp.int32) == alts[:, None]).astype(jnp.uint8)
    pad = (-L) % C
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        sorts = jnp.pad(sorts, (0, pad))

    iota = jnp.arange(H, dtype=jnp.int32)
    # rank of each haplotype under a0 (inverse permutation, via one sort)
    _, r0 = jax.lax.sort((a0, iota), num_keys=1, is_stable=False)

    def chunk(r, inp):
        xs, ss = inp  # [C, H] bits (natural order), [C] sort flags
        prefixes = []
        p = jnp.zeros((H,), jnp.int32)
        shift = jnp.int32(0)
        for j in range(C):
            prefixes.append(p)
            contrib = xs[j].astype(jnp.int32) << shift
            p = jnp.where(ss[j], p + contrib, p)
            shift = shift + ss[j].astype(jnp.int32)
        P = jnp.stack(prefixes)  # [C, H] history keys (latest bit highest)
        r_b = jnp.broadcast_to(r, (C, H))
        _, _, ys = jax.lax.sort((P, r_b, xs), dimension=1, num_keys=2,
                                is_stable=False)
        # rank update: invert the end-of-chunk arrangement (one scatter)
        _, _, a_end = jax.lax.sort((p, r, iota), num_keys=2, is_stable=False)
        r_new = jnp.zeros_like(r).at[a_end].set(iota)
        return r_new, ys

    n_chunks = x.shape[0] // C
    r_fin, ys = jax.lax.scan(
        chunk, r0, (x.reshape(n_chunks, C, H), sorts.reshape(n_chunks, C)))
    ys = ys.reshape(n_chunks * C, H)[:L]
    _, a_final = jax.lax.sort((r_fin, iota), num_keys=1, is_stable=False)
    return ys, a_final


@functools.partial(jax.jit, static_argnames=())
def pbwt_decode_scan(ys: jnp.ndarray, sorts: jnp.ndarray,
                     a0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter decoded bits back to natural order for every line.

    ys:    uint8[L, H] bits in arrangement order (garbage rows allowed for
           non-WAH lines; pass sorts=False there)
    sorts: bool[L]
    Returns (vals uint8[L, H] bits in natural haplotype order, a_final).

    TPU formulation: arbitrary gathers/scatters cost ~8 ns/element on the
    VPU, but `lax.sort` (bitonic network) moves the same data an order of
    magnitude faster.  Both per-line steps are expressed as sorts:
      * vals = sort(key=a, payload=y)        -- a is a permutation, so
        sorting by it inverts the arrangement and lands bits at their
        natural positions (unique keys: stability not required);
      * a'   = stable sort(key=y, payload=a) -- the PBWT stable partition
        is exactly a stable sort by the current bit.
    """

    def step(a, inp):
        y, sort = inp
        _, vals = jax.lax.sort((a, y), num_keys=1, is_stable=False)
        _, a_new = jax.lax.sort((y, a), num_keys=1, is_stable=True)
        a = jnp.where(sort, a_new, a)
        return a, vals

    a_final, vals = jax.lax.scan(step, a0, (ys, sorts))
    return vals, a_final
