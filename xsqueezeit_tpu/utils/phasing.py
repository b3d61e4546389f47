"""PBWT-neighbor heuristic phasing (the reference's experimental L9 tool).

Re-implements the reachable capability of /root/reference/include/phasing.hpp
(`phase_xcf`, `rephase_samples_given_permutation`,
`score_sample_given_permutation_neighbors`): stream a diploid VCF/BCF,
maintain a PBWT haplotype arrangement (MAF > 0.01 lines sort, like the
compressor), and phase each record's heterozygous samples by majority vote
of their four phased haplotype neighbours in arrangement order; homozygous
samples phase trivially; votes from unphased neighbours don't count.  The
threshold walks 4 -> 1, re-scoring after every round so freshly phased
samples vote for their neighbours.

Two documented deviations from the reference's literal (experimental,
CLI-unreachable) code:
  * a sample phases when |score| >= threshold (sign picks min-first vs
    max-first); the reference compares the SIGNED score, so max-first
    evidence (score <= -threshold) never fires even though its
    phase_sample(polarity) handles it — an evident slip in debug code
    (phasing.hpp:150-153);
  * scoring covers every sample (the reference passes n_samples where its
    loop bound expects the gt-array length, phasing.hpp:120-124, so only
    the first half of the cohort is scored).

Everything per record is vectorised numpy; the scoring rounds move O(het)
data only.
"""
from __future__ import annotations

import numpy as np

from ..ops import pbwt_np

PLOIDY = 2
MAF = 0.01  # phasing.hpp:203


def rephase_record(gt: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Phase one record's genotypes given the PBWT arrangement `a`.

    gt: htslib int32 codes [n_haps]; returns the phased copy.
    """
    gt = np.asarray(gt, np.int32).copy()
    n_haps = gt.shape[0]
    alleles = (gt >> 1) - 1
    pair = alleles.reshape(-1, 2)
    amin = pair.min(axis=1)
    amax = pair.max(axis=1)

    # homozygous (incl. ./. and half-missing pairs with equal codes):
    # phased as-is, min|max
    hom = amin == amax
    out_pair = np.empty_like(pair)
    out_pair[:, 0] = amin
    out_pair[:, 1] = amax
    phased_flag = np.zeros(pair.shape[0], bool)
    phased_flag[hom] = True

    a = np.asarray(a)
    a_index = np.empty(n_haps, np.int64)
    a_index[a] = np.arange(n_haps)

    todo = np.flatnonzero(~hom)
    threshold = 4
    while todo.size and threshold:
        # phased-neighbour votes, fully vectorised over `todo`
        cur_alleles = np.where(phased_flag.repeat(2),
                               out_pair.reshape(-1),
                               -9)  # unphased samples don't vote
        first_pos = a_index[todo * 2]
        second_pos = a_index[todo * 2 + 1]

        def vote(pos, sign):
            ok = (pos >= 0) & (pos < n_haps)
            nb_hap = a[np.clip(pos, 0, n_haps - 1)]
            nb_allele = cur_alleles[nb_hap]
            s = np.where(nb_allele == amin[todo], 1,
                         np.where(nb_allele == amax[todo], -1, 0))
            return np.where(ok, s * sign, 0)

        score = (vote(first_pos - 1, +1) + vote(first_pos + 1, +1)
                 + vote(second_pos - 1, -1) + vote(second_pos + 1, -1))
        fire = np.abs(score) >= threshold
        if not fire.any():
            threshold -= 1
            continue
        hit = todo[fire]
        sc = score[fire]
        out_pair[hit, 0] = np.where(sc >= 0, amin[hit], amax[hit])
        out_pair[hit, 1] = np.where(sc >= 0, amax[hit], amin[hit])
        phased_flag[hit] = True
        todo = todo[~fire]

    # default-phase inconclusive samples min|max (already in out_pair)
    return (((out_pair.reshape(-1) + 1) << 1) | 1).astype(np.int32)


def phase_file(input_path: str, output_path: str) -> dict:
    """Stream-phase a diploid VCF/BCF into a BCF (reference: phase_xcf
    writes BCF too, phasing.hpp:186)."""
    from ..io.bcf import BcfWriter, patch_shared_sample_counts
    from ..io.sites import encode_gt_indiv
    from ..io.unified import GtInput

    inp = GtInput(input_path)
    n_samples = len(inp.samples)
    n_haps = n_samples * PLOIDY
    mac_threshold = int(n_haps * MAF)
    a = np.arange(n_haps, dtype=np.int64)

    writer = BcfWriter(output_path, inp.header)

    n = 0
    for rec in inp:
        if rec.gt is None or rec.ploidy != PLOIDY:
            raise ValueError("phasing requires uniformly diploid GT data")
        phased = rephase_record(rec.gt, a)
        shared = patch_shared_sample_counts(rec.shared, n_fmt=1,
                                            n_sample=n_samples)
        writer.write_raw(shared,
                         encode_gt_indiv(inp.header, phased, PLOIDY,
                                         n_samples))
        # PBWT update on the phased output, MAF-gated like the compressor
        alleles = (phased >> 1) - 1
        for alt in range(1, rec.n_alleles):
            ac = int((alleles == alt).sum())
            if min(ac, n_haps - ac) > mac_threshold:
                a = pbwt_np.pbwt_sort(a, phased, alt)
        n += 1
    writer.close()
    inp.close()
    return {"records": n, "samples": n_samples}
