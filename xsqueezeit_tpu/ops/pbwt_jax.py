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
    """

    def step(a, inp):
        row, alt, sort = inp
        y = (row[a].astype(jnp.int32) == alt)
        a_new = stable_partition(a, y)
        a = jnp.where(sort, a_new, a)
        return a, y.astype(jnp.uint8)

    a_final, ys = jax.lax.scan(step, a0, (alleles, alts, sorts))
    return ys, a_final


@functools.partial(jax.jit, static_argnames=())
def pbwt_decode_scan(ys: jnp.ndarray, sorts: jnp.ndarray,
                     a0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter decoded bits back to natural order for every line.

    ys:    uint8[L, H] bits in arrangement order (garbage rows allowed for
           non-WAH lines; pass sorts=False there)
    sorts: bool[L]
    Returns (vals uint8[L, H] bits in natural haplotype order, a_final).
    """

    def step(a, inp):
        y, sort = inp
        vals = jnp.zeros_like(y).at[a].set(y)
        a_new = stable_partition(a, y)
        a = jnp.where(sort, a_new, a)
        return a, vals

    a_final, vals = jax.lax.scan(step, a0, (ys, sorts))
    return vals, a_final
