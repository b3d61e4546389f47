"""Sparse index-list codec for rare variants — NumPy oracle.

Wire format (restated from /root/reference/include/block.hpp:54-99 and
accessor_internals_new.hpp:619-653): one line is

    [count: A_T][indices: A_T x count]

where A_T is uint16 when the number of samples fits, else uint32, and the MSB
of `count` is a "negated" flag used by the genotype matrix (set when REF is
the minor allele, i.e. the stored indices are the positions NOT carrying the
sparse allele's complement).  The exception tracks (missing / end-of-vector)
use the same framing without ever setting the flag.
"""
from __future__ import annotations

import numpy as np


def msb(dtype: np.dtype) -> int:
    return 1 << (np.dtype(dtype).itemsize * 8 - 1)


def sparse_encode(indices: np.ndarray, negated: bool, dtype=np.uint32) -> np.ndarray:
    """Encode one sparse line into its wire array (count word + indices)."""
    dtype = np.dtype(dtype)
    indices = np.asarray(indices)
    count = indices.shape[0]
    if count >= msb(dtype):
        raise ValueError("sparse line too long for index type")
    head = count | (msb(dtype) if negated else 0)
    out = np.empty(count + 1, dtype)
    out[0] = head
    out[1:] = indices.astype(dtype)
    return out


def sparse_decode(stream: np.ndarray, pos: int = 0) -> tuple[np.ndarray, bool, int]:
    """Decode one sparse line starting at element `pos`.

    Returns (indices, negated, next_pos).
    """
    stream = np.asarray(stream)
    head = int(stream[pos])
    flag = msb(stream.dtype)
    negated = bool(head & flag)
    count = head & (flag - 1)
    start = pos + 1
    return stream[start:start + count], negated, start + count


def sparse_line_offsets(stream: np.ndarray, n_lines: int) -> np.ndarray:
    """Start offsets (in elements) of the first n_lines lines of a stream."""
    stream = np.asarray(stream)
    flag = msb(stream.dtype)
    offsets = np.empty(n_lines + 1, np.int64)
    pos = 0
    for i in range(n_lines):
        offsets[i] = pos
        pos += 1 + (int(stream[pos]) & (flag - 1))
    offsets[n_lines] = pos
    return offsets
