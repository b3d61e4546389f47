"""PBWT partition chains — Pallas TPU kernels.

The PBWT stable partition is a two-way stable compaction: zeros move LEFT
by `ones_before` positions, ones move RIGHT by `zeros_after`, and both
shift sequences are monotone along the row — so staged power-of-2 shifts
are collision-free (each group's intermediate positions stay distinct at
every stage).  A partition therefore costs ~log2(H) lane-roll stages on the
VPU instead of a ~log^2(H)-stage bitonic sort, and the whole chunk chain
(16 lines) runs VMEM-resident: the only HBM traffic is the input bits and
the final per-chunk state.

Junk tolerance removes all occupancy bookkeeping: each group's shift word
is `(shift << 1) | 1` for members and 0 for non-members/padding, so
non-members never move (bit k+1 of 0 is 0), a mover's source slot is
cleared (shift word -> 0) and movers only ever land on junk slots (real
intermediate positions are distinct).  The final merge selects group 0
for lanes < n_zeros and group 1 otherwise, which drops every junk slot.

Used by codec.decoder_jax / codec.encoder_jax via ops.pbwt_jax's chunked
entry points; semantics match pbwt_jax.pbwt_{encode,decode}_chunked
(reference semantics: /root/reference/include/gt_block.hpp:106-151,
accessor_internals_new.hpp:573-589).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nbits(h: int) -> int:
    return max(int(h - 1).bit_length(), 1)


def _prefix_sum_lanes(x, hp: int):
    """Inclusive prefix sum along the lane axis (Hillis-Steele log-shifts).

    x: i32[NB, hp].  pltpu.roll is circular; wrapped lanes are masked off.
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < hp:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(lanes >= k, shifted, 0)
        k <<= 1
    return x


def _partition_stage(vals, shifts, k: int, group0: bool, hp: int):
    """One staged-shift level for one group.

    vals/shifts: u32/i32[NB, hp]; members have shifts = (dist << 1) | 1,
    junk slots 0.  Moves elements whose distance bit k is set by +-2^k.
    pltpu.roll only accepts non-negative shifts: a left move by `step`
    is a circular right roll by hp - step.
    """
    step = (1 << k) if not group0 else hp - (1 << k)
    v_r = pltpu.roll(vals, step, 1)
    s_r = pltpu.roll(shifts, step, 1)
    take = (s_r >> (k + 1)) & 1
    leave = (shifts >> (k + 1)) & 1
    vals = jnp.where(take != 0, v_r, vals)
    shifts = jnp.where(take != 0, s_r, jnp.where(leave != 0, 0, shifts))
    return vals, shifts


def _chain_decode_kernel(y_ref, ss_ref, p_ref, *, C: int, H: int, hp: int,
                         epochs: int = 1):
    """Decode chunk chain: payload (chunk-start slot << 16 | beta bits).

    y_ref:  i32[NB, C, hp] bits in arrangement order (padding lanes 0).
    ss_ref: i32[NB, 1] per-chunk sort-flag bitmask (bit j = line j sorts;
            the beta bit is appended either way).
    p_ref:  u32[NB, epochs, hp] chunk state snapshots: the 16-bit register
            fills C/epochs lines at a time and is snapshotted + cleared at
            each epoch boundary (k keeps tracking through the whole chunk),
            so one kernel chunk serves `epochs` flush groups -- fewer chunk
            permutations for the composition scan outside.
    """
    NB = y_ref.shape[0]
    nbits = _nbits(H)
    ep_len = C // epochs
    lanes = jax.lax.broadcasted_iota(jnp.int32, (NB, hp), 1)
    real = lanes < H
    p0 = (lanes << 16).astype(jnp.uint32)

    def line(j, p):
        y = y_ref[:, j, :]
        p = p | (y << (j % ep_len)).astype(jnp.uint32)

        cum = _prefix_sum_lanes(y, hp)
        ones_before = cum - y
        ones_tot = jnp.broadcast_to(cum[:, hp - 1:hp], (NB, hp))
        n_zeros = H - ones_tot
        # zeros strictly after lane i (within the real H lanes)
        zeros_after = n_zeros - (lanes + 1 - cum)

        sort_j = (ss_ref[:, :] >> j) & 1  # [NB, 1]
        is0 = (y == 0) & real
        is1 = (y != 0) & real
        s0 = jnp.where(is0, (ones_before << 1) | 1, 0)
        s1 = jnp.where(is1, (zeros_after << 1) | 1, 0)
        a = p
        b = p
        for k in range(nbits):
            a, s0 = _partition_stage(a, s0, k, group0=True, hp=hp)
            b, s1 = _partition_stage(b, s1, k, group0=False, hp=hp)
        p_new = jnp.where(lanes < n_zeros, a, b)
        p = jnp.where(sort_j != 0, p_new, p)

        ep = j // ep_len
        is_boundary = (j % ep_len) == (ep_len - 1)

        @pl.when(is_boundary)
        def _():
            p_ref[:, ep, :] = p

        # clear the register at epoch boundaries; k (high bits) keeps going
        return jnp.where(is_boundary, p & jnp.uint32(0xFFFF0000), p)

    jax.lax.fori_loop(0, C, line, p0)


def _chain_encode_kernel(q_ref, ss_ref, y_ref, *, C: int, H: int, hp: int):
    """Encode chunk chain: q carries each slot's 16-bit register of the
    chunk's line bits; line j's arrangement-ordered bits are bit j of q.

    q_ref:  u32[NB, hp] loaded registers (chunk-start arrangement order).
    ss_ref: i32[NB, 1] per-chunk sort-flag bitmask (bit j = line j sorts).
    y_ref:  i32[NB, C, hp] output bits per line.
    """
    NB = q_ref.shape[0]
    nbits = _nbits(H)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (NB, hp), 1)
    real = lanes < H

    def line(j, q):
        y = ((q >> j) & 1).astype(jnp.int32)
        y = jnp.where(real, y, 0)
        y_ref[:, j, :] = y

        cum = _prefix_sum_lanes(y, hp)
        ones_before = cum - y
        ones_tot = jnp.broadcast_to(cum[:, hp - 1:hp], (NB, hp))
        n_zeros = H - ones_tot
        zeros_after = n_zeros - (lanes + 1 - cum)

        sort_j = (ss_ref[:, :] >> j) & 1  # [NB, 1]
        is0 = (y == 0) & real
        is1 = (y != 0) & real
        s0 = jnp.where(is0, (ones_before << 1) | 1, 0)
        s1 = jnp.where(is1, (zeros_after << 1) | 1, 0)
        a = q
        b = q
        for k in range(nbits):
            a, s0 = _partition_stage(a, s0, k, group0=True, hp=hp)
            b, s1 = _partition_stage(b, s1, k, group0=False, hp=hp)
        q_new = jnp.where(lanes < n_zeros, a, b)
        return jnp.where(sort_j != 0, q_new, q)

    jax.lax.fori_loop(0, C, line, q_ref[:, :])


def _pack_flags(ss: jnp.ndarray, C: int) -> jnp.ndarray:
    """[n_ch, C] 0/1 flags -> [n_ch, 1] bitmask (lane-dim dynamic indexing
    is not lowerable in Mosaic; a bit test by the loop counter is)."""
    w = (1 << jnp.arange(C, dtype=jnp.int32))[None, :]
    return jnp.sum(ss.astype(jnp.int32) * w, axis=1, keepdims=True)


def _pick_nb(n_ch: int, NB: int) -> int:
    """Largest multiple of 8 <= NB dividing n_ch (Mosaic block constraint),
    else the whole array."""
    for nb in range(min(NB, n_ch) // 8 * 8, 0, -8):
        if n_ch % nb == 0:
            return nb
    return n_ch


def _vmem_params(nb: int, C: int, hp: int):
    """Raised scoped-VMEM limit for wide haplotype axes.

    The chunk-chain blocks hold [nb, C, hp] i32 plus ~8 [nb, hp] work
    arrays; at HRC scale (hp ~ 65024) that is ~60 MB — far over the 16 MB
    v5e default, which hard-fails compilation (found by an on-chip
    HRC-scale round trip; the CPU test suite runs the XLA formulation and
    never hits this).  ~110 MB is the practical ceiling on v5e.
    """
    # block in+out (~C+1 rows) + VMEM work rows, with slack (measured on
    # chip at nb=8, C=16, hp=65024: encode needs 67.3 MiB scoped, decode
    # 90.4 MiB); keep the grant at/below ~100 MiB — the chip has 128 MiB
    # total and the fused program's other buffers share it.
    need = int(nb * (C + 14) * hp * 4 * 1.7)
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(need, 16 << 20), 100 << 20)))


@functools.partial(jax.jit,
                   static_argnames=("C", "H", "NB", "epochs", "interpret"))
def chain_decode(yc: jnp.ndarray, ss: jnp.ndarray, C: int, H: int,
                 NB: int = 8, epochs: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """Run the decode chunk chains.

    yc: i32[n_ch, C, hp] bits; ss: i32[n_ch, C] sort flags.
    Returns u32[n_ch, epochs, hp] chunk states (one snapshot per
    C/epochs-line epoch; squeeze axis 1 for epochs=1).
    """
    n_ch, c, hp = yc.shape
    assert c == C and hp % LANE == 0 and C % epochs == 0
    nb = _pick_nb(n_ch, NB)
    grid = (n_ch // nb,)
    kern = functools.partial(_chain_decode_kernel, C=C, H=H, hp=hp,
                             epochs=epochs)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((nb, C, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, epochs, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, epochs, hp), jnp.uint32),
        compiler_params=_vmem_params(nb, C, hp),
        interpret=interpret,
    )(yc, _pack_flags(ss, C))


@functools.partial(jax.jit, static_argnames=("C", "H", "NB", "interpret"))
def chain_encode(q0: jnp.ndarray, ss: jnp.ndarray, C: int, H: int,
                 NB: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Run the encode chunk chains.

    q0: u32[n_ch, hp] loaded bit registers; ss: i32[n_ch, C] sort flags.
    Returns y bits i32[n_ch, C, hp].
    """
    n_ch, hp = q0.shape
    assert hp % LANE == 0
    nb = _pick_nb(n_ch, NB)
    grid = (n_ch // nb,)
    kern = functools.partial(_chain_encode_kernel, C=C, H=H, hp=hp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((nb, hp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, C, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, C, hp), jnp.int32),
        compiler_params=_vmem_params(nb, C, hp),
        interpret=interpret,
    )(q0, _pack_flags(ss, C))
