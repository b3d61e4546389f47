"""CSI index: binning math, build+query round trip, region-path equality."""
import os

import numpy as np

from xsqueezeit_tpu.io.csi import (
    CsiBuilder,
    CsiIndex,
    reg2bin,
    reg2bins,
)

from tests.fixtures import random_vcf


def test_reg2bin_levels():
    # deepest level (14-bit windows) starts at bin 4681
    assert reg2bin(0, 1) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    # an interval spanning two 14-bit windows climbs one level
    assert reg2bin((1 << 14) - 1, (1 << 14) + 1) == 585
    # whole-chromosome interval lands in bin 0
    assert reg2bin(0, 1 << 31) == 0


def test_reg2bins_covers_reg2bin():
    rng = np.random.default_rng(0)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 22))
        end = beg + int(rng.integers(1, 1 << 16))
        qbeg = max(0, beg - int(rng.integers(0, 1 << 12)))
        qend = end + int(rng.integers(0, 1 << 12))
        # any record interval overlapping the query must sit in a listed bin
        b = reg2bin(beg, end)
        assert b in reg2bins(qbeg, qend)


def test_build_query_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    builder = CsiBuilder()
    records = []  # (rid, beg, end, voff)
    voff = 0
    for rid in (0, 2):
        pos = 0
        for _ in range(500):
            pos += int(rng.integers(1, 5000))
            vbeg, vend = voff, voff + 100
            voff = vend
            builder.add(rid, pos, pos + 1, vbeg, vend)
            records.append((rid, pos, vbeg))
    path = str(tmp_path / "t.csi")
    builder.write(path, n_ref=3)
    idx = CsiIndex.load(path)

    for rid, lo, hi in ((0, 100_000, 300_000), (2, 0, 50_000), (1, 0, 10**9)):
        chunks = idx.query(rid, lo, hi)
        covered = [v for r, p, v in records
                   if r == rid and lo <= p < hi]
        for v in covered:
            assert any(cb <= v < ce for cb, ce in chunks), (rid, v)
        # merged chunks are sorted and disjoint
        for (a1, a2), (b1, b2) in zip(chunks, chunks[1:]):
            assert a2 < b1 or (a1, a2) <= (b1, b2)
    assert idx.query(1, 0, 10**9) == []


def test_compressor_writes_csi_and_region_path_matches(tmp_path):
    vcf = str(tmp_path / "in.vcf")
    random_vcf(vcf, n_samples=31, n_records=300, seed=5)
    xsi = str(tmp_path / "out.xsi")

    from xsqueezeit_tpu.codec.compressor import CompressorOptions, compress_file
    from xsqueezeit_tpu.codec.decompressor import Decompressor, DecompressorOptions

    compress_file(vcf, xsi, CompressorOptions(device="numpy"))
    csi_path = xsi + "_var.bcf.csi"
    assert os.path.exists(csi_path)

    region = "20:60500-64000"
    out_idx = str(tmp_path / "idx.vcf")
    Decompressor(xsi, DecompressorOptions(regions=region,
                                          output_type="v")).decompress(out_idx)

    os.rename(csi_path, csi_path + ".hidden")  # force the linear path
    out_lin = str(tmp_path / "lin.vcf")
    Decompressor(xsi, DecompressorOptions(regions=region,
                                          output_type="v")).decompress(out_lin)

    body = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert body(out_idx) == body(out_lin)
    assert len(body(out_idx)) > 0


def test_add_many_matches_scalar_adds(tmp_path):
    """CsiBuilder.add_many (vectorized bulk path used by the native
    variant pass) must write a byte-identical .csi to per-record add()."""
    import numpy as np

    from xsqueezeit_tpu.io.csi import CsiBuilder

    rng = np.random.default_rng(12)
    n = 4000
    # two contigs, position-sorted, variable record lengths incl. spanning
    rid = np.sort(rng.integers(0, 2, n))
    pos = np.zeros(n, np.int64)
    for r in (0, 1):
        m = rid == r
        pos[m] = np.sort(rng.integers(0, 5_000_000, int(m.sum())))
    rlen = rng.choice([1, 1, 1, 50, 40000], size=n)
    end = pos + rlen
    # ascending fake voffsets, contiguous for most records (chunk merging)
    sizes = rng.integers(30, 90, n).astype(np.uint64)
    vend = np.cumsum(sizes) << np.uint64(16)
    vbeg = np.concatenate([[0], vend[:-1]]).astype(np.uint64)
    # inject gaps so not everything merges into one chunk
    gap = rng.random(n) < 0.05
    vbeg[gap] += np.uint64(1 << 16)

    a = CsiBuilder()
    for i in range(n):
        a.add(int(rid[i]), int(pos[i]), int(end[i]), int(vbeg[i]),
              int(vend[i]))
    b = CsiBuilder()
    b.add_many(rid, pos, end, vbeg, vend)
    pa, pb = str(tmp_path / "a.csi"), str(tmp_path / "b.csi")
    a.write(pa, n_ref=2)
    b.write(pb, n_ref=2)
    from xsqueezeit_tpu.io.bgzf import BgzfReader
    assert BgzfReader(pa).read() == BgzfReader(pb).read()
