"""Static-shape bucketing.

XLA compiles one executable per distinct input shape.  Block line counts and
stream lengths vary block to block (multi-allelic records, final short
block), so device inputs are padded up to power-of-two buckets to keep the
number of compilations constant over a whole file.
"""
from __future__ import annotations


def bucket(n: int, minimum: int = 256) -> int:
    """Smallest power-of-two >= n (at least `minimum`)."""
    b = minimum
    while b < n:
        b <<= 1
    return b
