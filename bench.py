#!/usr/bin/env python
"""Headline benchmark: device encode+decode throughput on 1KGP3-chr20-like
genotype blocks, verified bit-exact.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Workload: blocks of diploid biallelic records, 2504 samples (5008
haplotypes, the 1KGP3 panel size), 8192 records per block, allele
frequencies drawn from a rare-heavy mix mirroring chr20 (most sites below
the 0.001 MAF threshold -> sparse lines; the rest common -> PBWT+WAH
lines).  Measured: the fused device pipelines (encode: PBWT history sort +
WAH RLE + sparse compaction; decode: word-space WAH expansion + blocked
PBWT scatter), then a host round-trip assertion.

Timing methodology: on the tunneled TPU platform `block_until_ready` does
not reliably block, so each pipeline is timed as the slope between k=2 and
k=K chained loops terminated by a host scalar fetch (device executions
serialize, the fetch syncs; the slope cancels fixed dispatch/transfer
overhead).

Throughput is reported over the logical htslib genotype-array bytes
(4 bytes per haplotype slot), the same unit as the reference's
loading_time benchmark (chr20 full gt load: 15.83 s XSI vs 27.66 s BCF,
/root/reference/loading_time/README.md -> ~2.2 GB/s on its hardware).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_SAMPLES = 2504
H = N_SAMPLES * 2
L = 8192
MAF_THRESHOLD = int(H * 0.001)  # = 10, reference default --maf 0.001


def make_block(rng):
    """Rare-heavy MAF mix approximating 1KGP3 chr20 site-frequency spectrum."""
    kind = rng.random(L)
    freqs = np.where(
        kind < 0.55, rng.uniform(0.0, 0.0015, L),         # rare -> sparse
        np.where(kind < 0.80, rng.uniform(0.0015, 0.05, L),
                 rng.uniform(0.05, 0.95, L)))             # common -> WAH
    alleles = (rng.random((L, H)) < freqs[:, None]).astype(np.int8)
    return alleles


def slope_time(fn, fetch, ks=(2, 10), reps=3, passes=2):
    """Per-iteration seconds: slope of total time over k serialized runs.

    `fn()` returns the pipeline output; `fetch(out)` must pull a scalar of
    that output to host, forcing completion of every queued execution.
    Takes the best of `passes` independent slopes: the tunneled device
    occasionally injects multi-hundred-ms stalls into a single pass.
    """
    fetch(fn())  # warmup / compile

    def one_pass():
        ts = []
        for k in ks:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = fn()
                fetch(out)
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / (ks[1] - ks[0])

    return min(one_pass() for _ in range(passes))


def main():
    import jax
    import jax.numpy as jnp

    from xsqueezeit_tpu.ops import wah_jax
    from xsqueezeit_tpu.parallel.shard import _encode_one_block

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(20)
    alleles = make_block(rng)
    alts = np.ones(L, np.int32)
    W = wah_jax.n_words_for(H)

    encode = jax.jit(lambda a, t: _encode_one_block(a, t, jnp.int32(MAF_THRESHOLD),
                                                    MAF_THRESHOLD))
    a_dev = jax.device_put(jnp.asarray(alleles), dev)
    t_dev = jax.device_put(jnp.asarray(alts), dev)

    out = encode(a_dev, t_dev)
    enc_s = slope_time(lambda: encode(a_dev, t_dev),
                       lambda o: np.asarray(o["n_bytes"]))

    # Assemble the on-disk streams (host) for the decode benchmark.
    is_wah = np.asarray(out["is_wah"])
    wah_words = np.asarray(out["wah_words"])
    wah_len = np.asarray(out["wah_len"])
    take = (np.arange(W)[None, :] < wah_len[:, None]) & is_wah[:, None]
    stream = wah_words[take]
    compressed_bytes = stream.nbytes + int(
        (np.asarray(out["sparse_len"])[~is_wah] + 1).sum()) * 2

    from xsqueezeit_tpu.utils.shapes import bucket
    n_wah = int(is_wah.sum())
    n_pad = bucket(stream.shape[0] + 1)
    padded = np.concatenate([stream, np.zeros(n_pad - stream.shape[0], np.uint16)])
    Lw_pad = bucket(max(n_wah, 1))

    from xsqueezeit_tpu.codec.decoder_jax import _decode_wah_and_scan
    s_dev = jax.device_put(jnp.asarray(padded), dev)
    sorts_dev = jax.device_put(jnp.ones(Lw_pad, bool), dev)

    vals = _decode_wah_and_scan(s_dev, sorts_dev, H, W)
    dec_s = slope_time(lambda: _decode_wah_and_scan(s_dev, sorts_dev, H, W),
                       lambda o: np.asarray(o[0, :1]))

    # --- bit-exactness -----------------------------------------------------
    vals_np = np.asarray(vals[:n_wah])
    mism = int((vals_np.astype(bool) != (alleles[is_wah] == 1)).sum())
    # sparse lines: verify indices round-trip
    sp_idx = np.asarray(out["sparse_idx"])
    sp_len = np.asarray(out["sparse_len"])
    neg = np.asarray(out["negated"])
    for l in np.flatnonzero(~is_wah)[:64]:
        want = np.flatnonzero(alleles[l] == (0 if neg[l] else 1))
        got = sp_idx[l, :sp_len[l]]
        assert np.array_equal(want, got), f"sparse line {l} mismatch"
    assert mism == 0, f"{mism} WAH bit mismatches"

    gt_bytes = L * H * 4  # htslib int32 gt array equivalent
    enc_gbps = gt_bytes / enc_s / 1e9
    dec_gbps = gt_bytes / dec_s / 1e9
    rt_gbps = 2 * gt_bytes / (enc_s + dec_s) / 1e9

    ref_chr20_load_gbps = 2.2  # reference loading_time: 34.8GB / 15.83s
    print(f"encode: {enc_s*1e3:.2f} ms/block = {enc_gbps:.2f} GB/s | "
          f"decode: {dec_s*1e3:.2f} ms/block = {dec_gbps:.2f} GB/s | "
          f"compressed {compressed_bytes/1e6:.1f} MB for "
          f"{gt_bytes/1e9:.2f} GB logical ({gt_bytes/compressed_bytes:.0f}x)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "encode+decode GB/s per chip (1KGP3-chr20-like, bit-exact)",
        "value": round(rt_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(rt_gbps / ref_chr20_load_gbps, 2),
        "encode_gbps": round(enc_gbps, 3),
        "decode_gbps": round(dec_gbps, 3),
        "compression_ratio": round(gt_bytes / compressed_bytes, 1),
    }))


if __name__ == "__main__":
    main()
