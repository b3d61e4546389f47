"""WAH stream expansion — Pallas TPU kernel.

Expanding a concatenated WAH stream to per-line 15-bit groups means placing
word k at output slot start_k = cumsum(spans)_k and forward-filling fill
runs.  The placement shifts dist_k = slot(start_k) - k are monotone
non-decreasing (spans >= 1), so staged power-of-2 shifts are collision-free
(same argument as ops/pbwt_pallas.py) — this replaces XLA's element-wise
scatter (~5 ms for a chr20-like block) with ~log2(L*Wp) VMEM-resident roll
stages (+ a ~log2(Wp)-stage in-row cumulative max), everything on the VPU.

Output slots use a lane-padded row-major layout [n_lines, Wp] (Wp = W
rounded up to 128 lanes), so the forward fill is a pure lane-axis scan.
Global staged shifts across the 2D layout decompose into a lane roll plus
one/two row rolls selected by wrap position.

Format semantics restated from /root/reference/include/wah.hpp:75-105
(16-bit WAH2: MSB counter flag, bit14 fill value, 15-bit literals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wah_jax import ALL_SET, HIGH, MAXC, ONE

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _global_roll(x, step: int, wp: int):
    """Circular roll of a row-major [R, wp] array by `step` flat slots."""
    lane_part = step % wp
    row_part = step // wp
    if lane_part:
        x = pltpu.roll(x, lane_part, 1)
    a = pltpu.roll(x, row_part, 0) if row_part else x
    if lane_part:
        b = pltpu.roll(x, row_part + 1, 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(lanes < lane_part, b, a)
    return a


def _expand_kernel(z_ref, sh_ref, out_ref, *, n_lines: int, w: int, wp: int):
    """z_ref: i32[n_lines, wp] packed words at their stream-order slots
    (slot k of the flat layout holds ((pos_in_row+1) << 16 | word) of stream
    word k; junk slots 0).  sh_ref: i32 shift words ((dist << 1) | 1 for
    real words, 0 junk).  out_ref: resolved 15-bit groups per line.
    """
    z = z_ref[:, :]
    sh = sh_ref[:, :]
    total = n_lines * wp
    nbits = max(int(total - 1).bit_length(), 1)
    # MSB -> LSB staged shifts: masking LOW bits off preserves the order of
    # the (non-decreasing) distances, so positions k_i + (d_i & ~(2^k - 1))
    # stay strictly increasing at every stage — collision-free for ARBITRARY
    # monotone gap insertion (LSB-first is only safe for bounded-increment
    # compaction shifts like the PBWT partition's).
    for k in reversed(range(nbits)):
        step = (1 << k) % total
        z_r = _global_roll(z, step, wp)
        s_r = _global_roll(sh, step, wp)
        take = (s_r >> (k + 1)) & 1
        leave = (sh >> (k + 1)) & 1
        # unlike the PBWT partition kernel there is no positional merge at
        # the end, so a vacated slot's payload must be cleared for the
        # cumulative-max fill below
        z = jnp.where(take != 0, z_r, jnp.where(leave != 0, 0, z))
        sh = jnp.where(take != 0, s_r, jnp.where(leave != 0, 0, sh))

    # forward fill within rows: packed (pos+1) keys are increasing, so a
    # lane-axis cumulative max propagates each word over its covered slots.
    lanes = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    k = 1
    while k < wp:
        shifted = pltpu.roll(z, k, 1)
        z = jnp.maximum(z, jnp.where(lanes >= k, shifted, jnp.int32(-1)))
        k <<= 1

    word = z & 0xFFFF
    fill = jnp.where((word & ONE) != 0, ALL_SET, 0)
    out_ref[:, :] = jnp.where((word & HIGH) != 0, fill, word)


def _prefix_max_lanes(x, wp: int):
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < wp:
        shifted = pltpu.roll(x, k, 1)
        x = jnp.maximum(x, jnp.where(lanes >= k, shifted, jnp.int32(-1)))
        k <<= 1
    return x


def _prefix_sum_lanes(x, wp: int):
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < wp:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(lanes >= k, shifted, 0)
        k <<= 1
    return x


def _compress_kernel(w_ref, out_ref, n_ref, *, w: int, wp: int):
    """WAH2 RLE per row: run detection via lane prefix scans, emitted words
    front-packed with a staged-shift left compaction (monotone distances,
    LSB-first is collision-free for compaction).  Mirrors
    wah_jax.wah_compress_words exactly."""
    NB = w_ref.shape[0]
    words = w_ref[:, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (NB, wp), 1)
    real = lanes < w
    is_zero = (words == 0) & real
    is_ones = (words == ALL_SET) & real
    is_fill = is_zero | is_ones
    # class changes or literal words break runs (literals: unique class)
    cls = jnp.where(is_zero, -2, jnp.where(is_ones, -3, lanes))
    prev_cls = pltpu.roll(cls, 1, 1)
    boundary = (cls != prev_cls) | (lanes == 0)
    run_start = _prefix_max_lanes(jnp.where(boundary, lanes, -1), wp)
    pos_in_run = lanes - run_start
    sub_boundary = boundary | (is_fill & (pos_in_run > 0)
                               & (pos_in_run % MAXC == 0))
    sub_start = _prefix_max_lanes(jnp.where(sub_boundary, lanes, -1), wp)
    sub_len = lanes - sub_start + 1
    nxt = pltpu.roll(sub_boundary.astype(jnp.int32), wp - 1, 1)
    emit = (jnp.where(lanes == w - 1, 1, nxt) != 0) & real
    fill_word = HIGH | jnp.where(is_ones, ONE, 0) | sub_len
    out_val = jnp.where(is_fill, fill_word, words)

    emit_i = emit.astype(jnp.int32)
    cum = _prefix_sum_lanes(emit_i, wp)
    n_ref[:, :] = cum[:, wp - 1:wp]
    dest = cum - emit_i                      # exclusive prefix
    dist = jnp.where(emit, lanes - dest, 0)  # move LEFT, monotone
    sh = jnp.where(emit, (dist << 1) | 1, 0)
    z = jnp.where(emit, out_val, 0)
    nbits = max(int(wp - 1).bit_length(), 1)
    for k in range(nbits):
        step = wp - ((1 << k) % wp)
        z_r = pltpu.roll(z, step, 1)
        s_r = pltpu.roll(sh, step, 1)
        take = (s_r >> (k + 1)) & 1
        leave = (sh >> (k + 1)) & 1
        z = jnp.where(take != 0, z_r, jnp.where(leave != 0, 0, z))
        sh = jnp.where(take != 0, s_r, jnp.where(leave != 0, 0, sh))
    out_ref[:, :] = z


@functools.partial(jax.jit, static_argnames=("w", "NB", "interpret"))
def wah_compress_pallas(words: jnp.ndarray, w: int, NB: int = 8,
                        interpret: bool = False
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RLE-compress packed 15-bit words, batched: drop-in for
    wah_jax.wah_compress_words (returns (out uint16[L, w], n_out int32[L]))."""
    L = words.shape[0]
    wp = _ceil_to(max(w, 2), LANE)
    wpad = jnp.zeros((L, wp - words.shape[1]), words.dtype)
    wi = jnp.concatenate([words.astype(jnp.int32), wpad], axis=1)
    nb = NB
    while L % nb:
        nb //= 2
    nb = max(nb, 1)
    kern = functools.partial(_compress_kernel, w=w, wp=wp)
    out, n_out = pl.pallas_call(
        kern,
        grid=(L // nb,),
        in_specs=[pl.BlockSpec((nb, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((nb, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nb, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((L, wp), jnp.int32),
                   jax.ShapeDtypeStruct((L, 1), jnp.int32)),
        interpret=interpret,
    )(wi)
    return out[:, :w].astype(jnp.uint16), n_out[:, 0]


def _expand_rows_kernel(z_ref, sh_ref, out_ref, *, wp: int):
    """Per-row staged expansion for a block of rows.

    z_ref: i32[NB, wp] packed words at their WITHIN-ROW stream positions
    (slot c of row r holds ((dest_col+1) << 16 | word) of row r's c-th
    stream word; slots past the row's word count are 0).  sh_ref: i32
    within-row shifts ((dist << 1) | 1 real, 0 junk), dist < wp always —
    WAH counters never straddle lines (each line is encoded separately
    and concatenated, wah.hpp:75-105), so every word's movement is
    bounded by the row width and the staged shifts are LANE rolls only.
    That bound is what makes the kernel blockable over rows: VMEM per
    block is NB*wp words regardless of the total grid, so there is no
    width cliff (the flat-layout kernel above must hold the whole grid).
    """
    z = z_ref[:, :]
    sh = sh_ref[:, :]
    nbits = max(int(wp - 1).bit_length(), 1)
    for k in reversed(range(nbits)):
        step = (1 << k) % wp
        z_r = pltpu.roll(z, step, 1)
        s_r = pltpu.roll(sh, step, 1)
        take = (s_r >> (k + 1)) & 1
        leave = (sh >> (k + 1)) & 1
        z = jnp.where(take != 0, z_r, jnp.where(leave != 0, 0, z))
        sh = jnp.where(take != 0, s_r, jnp.where(leave != 0, 0, sh))

    z = _prefix_max_lanes(z, wp)
    word = z & 0xFFFF
    fill = jnp.where((word & ONE) != 0, ALL_SET, 0)
    out_ref[:, :] = jnp.where((word & HIGH) != 0, fill, word)


@functools.partial(jax.jit, static_argnames=("n_lines", "w", "interpret"))
def wah_expand_rows_pallas(stream: jnp.ndarray, n_lines: int, w: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Row-blocked WAH expansion: any width, bounded VMEM.

    Same contract as wah_expand_pallas / wah_jax.wah_expand_stream.  The
    prep rebases every stream word to its row: the word's first-in-row
    stream index comes from an elementwise cummax (no gather), the
    within-row layout from one vmapped dynamic-slice per row, and the
    kernel then runs log2(wp) lane-only roll stages per NB-row block —
    built for the HRC regime (w ~ 4332) where the flat kernel's whole-grid
    VMEM residency exceeds the chip.
    """
    wp = _ceil_to(max(w, 2), LANE)
    s = stream.astype(jnp.int32)
    total_cap = n_lines * w
    n = s.shape[0]
    is_counter = (s & HIGH) != 0
    span = jnp.where(is_counter, s & MAXC, 1)
    start = jnp.cumsum(span) - span            # flat slot in W-space
    row = start // w
    col = start - row * w
    valid = (row < n_lines) & (start < total_cap)
    k_idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), row[1:] != row[:-1]])
    S_k = jax.lax.cummax(jnp.where(first, k_idx, -1))   # row's first word
    col_src = k_idx - S_k
    dist = jnp.clip(col - col_src, 0, wp - 1)
    packed = jnp.where(valid, ((col + 1) << 16) | s, 0)
    shv = jnp.where(valid, (dist << 1) | 1, 0)

    counts = jax.ops.segment_sum(valid.astype(jnp.int32),
                                 jnp.clip(row, 0, n_lines - 1),
                                 num_segments=n_lines)
    row_start = jnp.cumsum(counts) - counts
    packed_p = jnp.pad(packed, (0, wp))
    shv_p = jnp.pad(shv, (0, wp))

    def slice_row(off):
        return (jax.lax.dynamic_slice(packed_p, (off,), (wp,)),
                jax.lax.dynamic_slice(shv_p, (off,), (wp,)))

    z0, sh0 = jax.vmap(slice_row)(row_start)
    lane = jnp.arange(wp, dtype=jnp.int32)[None, :]
    keep = lane < counts[:, None]
    z0 = jnp.where(keep, z0, 0)
    sh0 = jnp.where(keep, sh0, 0)

    nb = max(int((2 << 20) // (wp * 4)), 1)
    nb = 1 << (nb.bit_length() - 1)
    while n_lines % nb:
        nb //= 2
    nb = max(nb, 1)
    kern = functools.partial(_expand_rows_kernel, wp=wp)
    out = pl.pallas_call(
        kern,
        grid=(n_lines // nb,),
        in_specs=[pl.BlockSpec((nb, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_lines, wp), jnp.int32),
        interpret=interpret,
    )(z0, sh0)
    return out[:, :w]


@functools.partial(jax.jit, static_argnames=("n_lines", "w", "interpret"))
def wah_expand_pallas(stream: jnp.ndarray, n_lines: int, w: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Expand a uniform-width WAH stream to [n_lines, w] 15-bit groups.

    Drop-in replacement for wah_jax.wah_expand_stream (same contract:
    zero-padded stream tail decodes to inert all-zero rows).
    """
    wp = _ceil_to(w, LANE)
    total = n_lines * wp
    # The kernel holds the whole [n_lines, wp] grid in VMEM (no blocking).
    # At WIDE lines (HRC scale: w ~ 4332 for 64976 haps) the staged-shift
    # live ranges spill ~100 MB of registers and the program exceeds the
    # chip's 128 MB VMEM (measured on v5e); tall-and-narrow grids (e.g.
    # all-WAH chr20 blocks, [8192, 448]) compile fine with a raised VMEM
    # grant.  Beyond the width/footprint regime, take the ROW-BLOCKED
    # kernel (within-row shifts only, bounded VMEM at any width).
    if wp > 1024 or total * 4 * 6 > (100 << 20):
        return wah_expand_rows_pallas(stream, n_lines, w,
                                      interpret=interpret)
    s = stream.astype(jnp.int32)
    if s.shape[0] > total:
        # over-padded stream: real words never exceed n_lines * w, so the
        # excess is zero padding and can be dropped
        s = s[:total]
    n = s.shape[0]
    is_counter = (s & HIGH) != 0
    span = jnp.where(is_counter, s & MAXC, 1)
    start = jnp.cumsum(span) - span            # flat slot in W-space
    row = start // w
    col = start - row * w
    slot = row * wp + col                      # flat slot in padded layout
    k_idx = jnp.arange(n, dtype=jnp.int32)
    dist = jnp.clip(slot - k_idx, 0, total - 1)
    valid = slot < total
    packed = ((col + 1) << 16) | s
    z0 = jnp.where(valid, packed, 0)
    sh0 = jnp.where(valid, (dist << 1) | 1, 0)
    pad = total - n
    if pad < 0:
        raise ValueError("stream longer than output capacity")
    z0 = jnp.pad(z0, (0, pad)).reshape(n_lines, wp)
    sh0 = jnp.pad(sh0, (0, pad)).reshape(n_lines, wp)

    kern = functools.partial(_expand_kernel, n_lines=n_lines, w=w, wp=wp)
    vmem_need = 6 * total * 4  # z, sh, out + rolled temps
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_lines, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_need, 16 << 20), 110 << 20)),
        interpret=interpret,
    )(z0, sh0)
    return out[:, :w]
