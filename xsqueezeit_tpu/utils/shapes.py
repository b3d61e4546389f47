"""Static-shape bucketing.

XLA compiles one executable per distinct input shape.  Block line counts and
stream lengths vary block to block (multi-allelic records, final short
block), so device inputs are padded up to power-of-two buckets to keep the
number of compilations constant over a whole file.
"""
from __future__ import annotations


def bucket(n: int, minimum: int = 256) -> int:
    """Smallest bucket >= n from {2^k, 1.5 * 2^k} (at least `minimum`).

    Midpoint buckets halve the worst-case padding (33% instead of 100%)
    at the cost of one extra compiled variant per octave; compiled
    executables persist across runs (utils.jaxcache).
    """
    b = minimum
    while b < n:
        if (b + (b >> 1)) >= n:
            return b + (b >> 1)
        b <<= 1
    return b
