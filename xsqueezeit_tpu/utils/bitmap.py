"""PBWT bitmap visualizations — counterpart of the reference's debug layer
(/root/reference/include/bitmap.hpp: plain / PBWT-sorted genotype bitmaps,
reachable there via commented-out debug flags, xsqueezeit.hpp:60-82).

Bitmaps render the carrier matrix of bi-allelic views: rows = variants,
columns = haplotypes.  The sorted variant applies the evolving PBWT
arrangement to each row, which makes the haplotype-block structure the
codec exploits visible (long same-value runs -> WAH fills).
"""
from __future__ import annotations

import numpy as np

from ..io.unified import GtInput
from ..ops import pbwt_np


def gt_bitmap(path: str, max_records: int | None = None) -> np.ndarray:
    """Carrier-bit matrix bool[variants, haplotypes] in natural order."""
    inp = GtInput(path)
    rows = []
    for i, rec in enumerate(inp):
        if max_records is not None and i >= max_records:
            break
        if rec.gt is None:
            continue
        rows.append(((rec.gt >> 1) - 1) > 0)
    inp.close()
    return np.stack(rows) if rows else np.zeros((0, 0), bool)


def pbwt_sorted_bitmap(path: str, max_records: int | None = None,
                       reset_every: int | None = None) -> np.ndarray:
    """Carrier bits with each row permuted by the PBWT arrangement built
    from the previous rows (reset to identity every `reset_every` rows to
    mirror block boundaries)."""
    plain = gt_bitmap(path, max_records)
    if plain.size == 0:
        return plain
    L, H = plain.shape
    a = np.arange(H)
    out = np.zeros_like(plain)
    for l in range(L):
        if reset_every and l % reset_every == 0:
            a = np.arange(H)
        out[l] = plain[l][a]
        a = pbwt_np.stable_partition(a, plain[l][a])
    return out


def save_pbm(path: str, bitmap: np.ndarray) -> None:
    """Write a portable bitmap (P4) image: black = carrier."""
    h, w = bitmap.shape
    packed = np.packbits(bitmap.astype(np.uint8), axis=1)
    with open(path, "wb") as f:
        f.write(f"P4\n{w} {h}\n".encode())
        f.write(packed.tobytes())
