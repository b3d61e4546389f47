"""Straight-line scalar re-statements of the wire-format semantics.

These are deliberately naive (per-bit Python loops) and exist only to check
the vectorised NumPy oracles in xsqueezeit_tpu.ops against an independently
written implementation of the documented format.
"""
from __future__ import annotations


def wah_encode_scalar(bits):
    """WAH2 encode, one bit at a time (mirrors the documented algorithm)."""
    WAH_BITS = 15
    HIGH = 1 << 15
    ONE = 1 << 14
    MAXC = (1 << 14) - 1
    n = len(bits)
    n_words = (n + WAH_BITS - 1) // WAH_BITS
    padded = list(bits) + [0] * (n_words * WAH_BITS - n)
    out = []
    zeros = ones = 0
    for w in range(n_words):
        word = 0
        for j in range(WAH_BITS):
            if padded[w * WAH_BITS + j]:
                word |= 1 << j
        if word == 0:
            if ones:
                out.append(HIGH | ONE | ones)
                ones = 0
            if zeros == MAXC:
                out.append(HIGH | MAXC)
                zeros = 0
            zeros += 1
        elif word == 0x7FFF:
            if zeros:
                out.append(HIGH | zeros)
                zeros = 0
            if ones == MAXC:
                out.append(HIGH | ONE | MAXC)
                ones = 0
            ones += 1
        else:
            if ones:
                out.append(HIGH | ONE | ones)
                ones = 0
            if zeros:
                out.append(HIGH | zeros)
                zeros = 0
            out.append(word)
    if zeros:
        out.append(HIGH | zeros)
    if ones:
        out.append(HIGH | ONE | ones)
    return out


def wah_decode_scalar(words, size):
    """WAH2 decode `size` bits; returns (bits, words_consumed)."""
    WAH_BITS = 15
    HIGH = 1 << 15
    ONE = 1 << 14
    MAXC = (1 << 14) - 1
    bits = []
    used = 0
    while len(bits) < size:
        word = words[used]
        used += 1
        if word & HIGH:
            fill = 1 if (word & ONE) else 0
            bits.extend([fill] * ((word & MAXC) * WAH_BITS))
        else:
            for j in range(WAH_BITS):
                bits.append((word >> j) & 1)
    return bits[:size], used


def pbwt_step_scalar(a, key_in_arrangement_order):
    zeros, ones = [], []
    for i, h in enumerate(a):
        (ones if key_in_arrangement_order[i] else zeros).append(h)
    return zeros + ones
