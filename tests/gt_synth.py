"""Synthetic genotype record generators for tests.

Produces htslib-style int32 gt arrays exercising every format feature:
rare/common variants, multi-allelic records, missing values, end-of-vector
(in-line mixed ploidy), non-uniform phasing, and fully-haploid lines.
"""
from __future__ import annotations

import numpy as np

from xsqueezeit_tpu.format.constants import INT32_VECTOR_END


def make_record(rng, n_samples, n_alts=1, p_alt=0.3, phased=True,
                p_missing=0.0, p_eov=0.0, p_phase_flip=0.0, haploid=False):
    """Returns (gt_arr int32, n_alleles)."""
    ploidy = 1 if haploid else 2
    n = n_samples * ploidy
    alleles = rng.choice(n_alts + 1, size=n,
                         p=[1 - p_alt] + [p_alt / n_alts] * n_alts)
    gt = ((alleles + 1) << 1).astype(np.int32)
    if phased and not haploid:
        # phase bit on second allele of each sample
        gt[1::2] |= 1
    if p_phase_flip and not haploid:
        flips = rng.random(n_samples) < p_phase_flip
        gt[1::2][flips] ^= 1
    if p_missing:
        miss = rng.random(n) < p_missing
        gt[miss] = (gt[miss] & 1)  # keep phase bit, allele -> missing
    if p_eov and not haploid:
        # second allele of some samples becomes END_OF_VECTOR (ploidy-1 sample)
        eov = rng.random(n_samples) < p_eov
        gt[1::2][eov] = INT32_VECTOR_END
    return gt, n_alts + 1


def record_stream(rng, n_samples, n_records, **kw):
    return [make_record(rng, n_samples, **kw) for _ in range(n_records)]
