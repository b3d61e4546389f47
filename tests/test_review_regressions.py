"""Regressions from the round-1 code review: multi-allelic negated-sparse
decode, zero-ALT (monomorphic) records, -O x option carry-over."""
import numpy as np
import pytest

from tests import fixtures
from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.codec.decoder_jax import decode_block_records
from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder
from xsqueezeit_tpu.format.header import XsiHeader
from xsqueezeit_tpu.io.unified import GtInput


def _block(records, n_samples, mac_threshold=1):
    enc = GtBlockEncoder(n_samples=n_samples, block_bcf_lines=64,
                         mac_threshold=mac_threshold, default_phasing=0,
                         aet_dtype=np.uint16)
    for gt, na in records:
        enc.encode_record(np.asarray(gt, np.int32), na)
    return enc.serialize()


def test_device_negated_sparse_multiallelic_matches_numpy():
    # ALT1 near-fixed (negated sparse: stored REF set is the complement of
    # {allele != 0}, which covers the ALT2 carrier), ALT2 rare
    gt = [(1 + 1) << 1, (1 + 1) << 1, (1 + 1) << 1, (2 + 1) << 1]
    payload = _block([(gt, 3)], n_samples=2)
    dec = GtBlockDecoder(payload, 2, 4, np.uint16)
    dec.seek(0)
    want = dec.fill_genotype_array_advance(3)
    got = decode_block_records(payload, 2, 4, np.uint16, [3])[0]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, np.asarray(gt))


def test_zero_alt_record_roundtrip():
    g0 = [2, 2, 2, 2]          # 0|0 at an ALT='.' site: zero binary lines
    g1 = [2, 4, 2, 4]
    payload = _block([(g0, 1), (g1, 2)], n_samples=2)
    dec = GtBlockDecoder(payload, 2, 4, np.uint16)
    dec.seek(0)
    np.testing.assert_array_equal(dec.fill_genotype_array_advance(1), g0)
    np.testing.assert_array_equal(dec.fill_genotype_array_advance(2), g1)
    counts = GtBlockDecoder(payload, 2, 4, np.uint16)
    counts.seek(0)
    assert counts.fill_allele_counts_advance(1).tolist() == [4, 0]
    # device batch path agrees
    got = decode_block_records(payload, 2, 4, np.uint16, [1, 2])
    np.testing.assert_array_equal(got[0], g0)
    np.testing.assert_array_equal(got[1], g1)


def test_zero_alt_with_missing_rejected():
    miss = [0, 1, 2, 2]        # './|.' at a zero-ALT site: unrepresentable
    with pytest.raises(ValueError, match="no ALT"):
        _block([(miss, 1)], n_samples=2)


def test_zero_alt_vcf_end_to_end(tmp_path):
    rows = [
        ("60001", "rs1", "G", ".", [2, 2, 2, 2], 1),
        ("60002", "rs2", "G", "A", [2, 4, 4, 2], 2),
    ]
    p = tmp_path / "mono.vcf"
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\n")
        f.write("20\t60001\trs1\tG\t.\t.\tPASS\t.\tGT\t0|0\t0|0\n")
        f.write("20\t60002\trs2\tG\tA\t.\tPASS\t.\tGT\t0|1\t1|0\n")
    xsi = str(tmp_path / "m.xsi")
    out = str(tmp_path / "m.out.vcf")
    assert cli_main(["-c", "-f", str(p), "-o", xsi]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", out]) == 0
    def rows(path):
        inp = GtInput(path)
        r = [(rec.n_alleles, rec.gt.tolist()) for rec in inp]
        inp.close()
        return r

    assert rows(out) == rows(str(p))


def test_recompress_preserves_maf(tmp_path):
    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=40,
                              n_records=60, seed=41)
    xsi = str(tmp_path / "a.xsi")
    cli_main(["-c", "-f", vcf, "-o", xsi, "--maf", "0.1"])
    h1 = XsiHeader.unpack(open(xsi, "rb").read(256))
    assert h1.rare_threshold == int(80 * 0.1)
    xsi2 = str(tmp_path / "b.xsi")
    cli_main(["-x", "-f", xsi, "-o", xsi2, "-O", "x"])
    h2 = XsiHeader.unpack(open(xsi2, "rb").read(256))
    assert h2.rare_threshold == h1.rare_threshold


def test_bgzf_writer_to_pipe(tmp_path):
    """-p pipes BCF to a non-seekable stream (tell() unavailable)."""
    import subprocess, sys
    vcf = fixtures.random_vcf(str(tmp_path / "p.vcf"), n_samples=6,
                              n_records=10, seed=42)
    xsi = str(tmp_path / "p.xsi")
    cli_main(["-c", "-f", vcf, "-o", xsi])
    r = subprocess.run(
        [sys.executable, "-m", "xsqueezeit_tpu.cli", "-x", "-f", xsi, "-p"],
        capture_output=True, cwd="/root/repo",
        env={**__import__("os").environ, "XSI_DEVICE": "numpy"})
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert r.stdout[:3] != b""  # BGZF bytes arrived through the pipe
    blob = tmp_path / "pipe.bcf"
    blob.write_bytes(r.stdout)
    inp = GtInput(str(blob))
    assert sum(1 for _ in inp) == 10
    inp.close()


def test_csi_loff_spanning_record(tmp_path):
    """A long spanning record must stay reachable via any leaf bin's loff
    (htslib linear-index semantics)."""
    from xsqueezeit_tpu.io.csi import CsiBuilder, CsiIndex, n_bins
    import struct
    from xsqueezeit_tpu.io.bgzf import BgzfReader
    b = CsiBuilder()
    # record A spans 10kb..40kb (several 16kb windows), coarse bin
    b.add(0, 10000, 40000, 100 << 16, 200 << 16)
    # record B, a SNP at 33kb, lands in a leaf bin with a later offset
    b.add(0, 33000, 33001, 500 << 16, 600 << 16)
    p = str(tmp_path / "x.csi")
    b.write(p, n_ref=1)
    # parse raw: the leaf bin containing 33000 must have loff <= record A's
    r = BgzfReader(p)
    data = r.read()
    r.close()
    pos = 16 + 4
    (nb,) = struct.unpack_from("<i", data, pos)
    pos += 4
    meta = n_bins(5) + 1
    loffs = {}
    for _ in range(nb):
        bin_id, loff, nc = struct.unpack_from("<IQi", data, pos)
        pos += 16 + 16 * nc
        loffs[bin_id] = loff
    from xsqueezeit_tpu.io.csi import reg2bin
    leaf = reg2bin(33000, 33001)
    assert leaf in loffs
    assert loffs[leaf] <= (100 << 16), "loff must not skip the spanning record"


def test_native_zero_alt_and_bad_bm(tmp_path):
    from xsqueezeit_tpu.interop.native import NativeAccessor
    p = tmp_path / "mono.vcf"
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\n"
                "20\t60001\trs1\tG\t.\t.\tPASS\t.\tGT\t0|0\t0|0\n"
                "20\t60002\trs2\tG\tA\t.\tPASS\t.\tGT\t0|1\t1|0\n")
    xsi = str(tmp_path / "m.xsi")
    cli_main(["-c", "-f", str(p), "-o", xsi])
    acc = NativeAccessor(xsi)
    rows = [(na, gt.tolist()) for na, gt in acc]
    assert rows[0] == (1, [2, 3, 2, 3])       # all-REF, default phased
    assert rows[1][0] == 2
    with pytest.raises(OSError):
        acc.fill_genotypes_bm(1 << 20, 2)     # out-of-range block id
    with pytest.raises(OSError):
        acc.fill_genotypes_bm(-1, 2)
    acc.close()


def test_vcf_crlf_and_format_tags(tmp_path):
    p = tmp_path / "crlf.vcf"
    body = ("##fileformat=VCFv4.2\r\n"
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\r\n'
            '##FORMAT=<ID=GTX,Number=1,Type=Integer,Description="x">\r\n'
            "##contig=<ID=20>\r\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\r\n"
            "20\t100\t.\tG\tA\t.\tPASS\t.\tGT\t0|1\t1|1\r\n"
            "20\t101\t.\tG\tA\t.\tPASS\t.\tGTX\t3\t4\r\n")
    p.write_bytes(body.encode())
    from xsqueezeit_tpu.io.vcf import VcfReader
    r = VcfReader(str(p))
    recs = list(r)
    r.close()
    assert recs[0].gt.tolist() == [2, 5, 4, 5]
    assert recs[1].gt is None                  # GTX is not GT


def test_unique_id():
    from xsqueezeit_tpu.utils.mutate import unique_id
    from xsqueezeit_tpu.io.bcf import BcfRecord
    from xsqueezeit_tpu.io.sites import encode_shared_from_vcf_cols
    from xsqueezeit_tpu.io.bcf import BcfHeader
    h = BcfHeader.from_text(
        "##fileformat=VCFv4.2\n##contig=<ID=20>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")
    shared = encode_shared_from_vcf_cols(
        h, ["20", "123", "rs9", "G", "A", ".", ".", "."], 0, 0)
    rec = BcfRecord.parse(shared, b"")
    assert unique_id(rec) == "0_122_G_A_"


# ---------------------------------------------------------------------------
# Round-1 advisor findings (ADVICE.md)
# ---------------------------------------------------------------------------
def test_wah_zero_count_counter_rejected():
    """A counter word with count==0 (corrupt/foreign stream) must raise, not
    silently mis-decode (advisor: wah_jax.wah_expand_stream slot collision)."""
    from xsqueezeit_tpu.format.constants import GTDict
    from xsqueezeit_tpu.ops import wah_np

    rng = np.random.default_rng(7)
    # common variants -> WAH lines with literal words
    recs = [((rng.integers(0, 2, 64) + 1) << 1, 2) for _ in range(8)]
    payload = bytearray(_block([(g.tolist(), na) for g, na in recs],
                               n_samples=32, mac_threshold=4))
    dec = GtBlockDecoder(bytes(payload), 32, 64, np.uint16)
    assert dec.wah_stream is not None and len(dec.wah_stream)
    off = dec.dictionary[GTDict.KEY_MATRIX_WAH]
    # overwrite the first stream word with a zero-count counter
    payload[off:off + 2] = int(wah_np.WAH_HIGH_BIT).to_bytes(2, "little")
    with pytest.raises(ValueError, match="zero count"):
        GtBlockDecoder(bytes(payload), 32, 64, np.uint16)


def test_validate_wah_stream_direct():
    from xsqueezeit_tpu.ops import wah_np
    wah_np.validate_wah_stream(np.array([0x0001, 0x8003, 0xC001, 0, 0],
                                        np.uint16))
    for bad in (0x8000, 0xC000):
        with pytest.raises(ValueError, match="zero count"):
            wah_np.validate_wah_stream(np.array([0x0001, bad], np.uint16))


def test_csi_depth_grows_with_contig_length():
    """Advisor: depth was hardcoded 5, capping coordinates at 2^29."""
    from xsqueezeit_tpu.io.csi import CsiBuilder, depth_for_max_len

    assert depth_for_max_len(63_025_520) == 5          # human chr20
    assert depth_for_max_len(None) == 5
    assert depth_for_max_len((1 << 29) + 1) == 6       # > 537 Mbp grows
    assert depth_for_max_len(1 << 33) == 7
    # coordinates beyond the addressable range are rejected, not aliased
    b = CsiBuilder(depth=5)
    with pytest.raises(ValueError, match="addressable"):
        b.add(0, (1 << 29) + 5, (1 << 29) + 6, 0, 1)
    b6 = CsiBuilder(depth=6)
    b6.add(0, (1 << 29) + 5, (1 << 29) + 6, 0, 1)      # fits at depth 6


def test_long_contig_region_end_to_end(tmp_path):
    """Compress + region-extract on a >2^29 bp contig (plant-scale)."""
    pos = (1 << 29) + 12345
    p = tmp_path / "long.vcf"
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=1,length=1073741824>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\n")
        f.write(f"1\t100\trs0\tG\tA\t.\tPASS\t.\tGT\t0|1\t0|0\n")
        f.write(f"1\t{pos}\trs1\tG\tA\t.\tPASS\t.\tGT\t0|1\t1|1\n")
        f.write(f"1\t{pos + 50}\trs2\tG\tT\t.\tPASS\t.\tGT\t1|0\t0|0\n")
    xsi = str(tmp_path / "long.xsi")
    out = str(tmp_path / "long.out.vcf")
    assert cli_main(["-c", "-f", str(p), "-o", xsi]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", out,
                     "-r", f"1:{pos}-{pos + 10}"]) == 0
    inp = GtInput(out)
    got = [rec.gt.tolist() for rec in inp]
    inp.close()
    assert got == [[2, 5, 4, 5]]


def test_bgzf_wraps_positioned_file(tmp_path):
    """Advisor: virtual offsets must be file-absolute when wrapping an
    already-positioned file object."""
    from xsqueezeit_tpu.io.bgzf import BgzfReader, BgzfWriter

    p = tmp_path / "pre.bin"
    prefix = b"PREFIX--" * 4
    with open(p, "wb") as raw:
        raw.write(prefix)
        w = BgzfWriter(raw)
        v0 = w.tell_virtual()
        assert (v0 >> 16) == len(prefix)
        w.write(b"hello ")
        voff = w.tell_virtual()
        w.write(b"world")
        w.close()
    with open(p, "rb") as raw:
        raw.seek(len(prefix))
        r = BgzfReader(raw)
        assert r.read() == b"hello world"
        r.seek_virtual(voff)
        assert r.read() == b"world"
        r.close()


def test_compress_failure_cleans_outputs(tmp_path):
    """Advisor: a failed compression must not leave partial outputs or leak
    the encode worker thread."""
    import os
    import threading

    p = tmp_path / "bad.vcf"
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\n")
        # zero-ALT site carrying missing: the encoder must reject it
        f.write("20\t60001\trs1\tG\t.\t.\tPASS\t.\tGT\t./.\t0|0\n")
    xsi = str(tmp_path / "bad.xsi")
    from xsqueezeit_tpu.codec.compressor import compress_file
    before = threading.active_count()
    with pytest.raises(ValueError):
        compress_file(str(p), xsi)
    assert not os.path.exists(xsi)
    assert not os.path.exists(xsi + "_var.bcf")
    assert not os.path.exists(xsi + "_var.bcf.csi")
    assert threading.active_count() <= before + 1  # no leaked encode worker


def test_bgzf_threaded_writer_roundtrip(tmp_path):
    """threads>0 parallelizes BGZF block deflate; output must read back
    identically and virtual offsets must stay exact (drain-on-tell)."""
    from xsqueezeit_tpu.io.bgzf import BgzfReader, BgzfWriter

    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 1_000_000, dtype=np.uint8).tobytes()
    p = tmp_path / "t.bgzf"
    w = BgzfWriter(str(p), threads=3)
    w.write(data[:300_000])
    v = w.tell_virtual()
    w.write(data[300_000:])
    w.close()
    r = BgzfReader(str(p))
    assert r.read() == data
    r.seek_virtual(v)
    assert r.read() == data[300_000:]
    r.close()


def test_haploid_sparse_line_carries_no_phase_bit():
    """Decoder regression (round 3): the sparse-line fill branch applied
    default_phasing to odd NATURAL indices even on haploid lines, so any
    haploid record whose line went sparse (mac <= threshold) decoded with
    phase bits that were never encoded.  Haploid slots carry no phase bit
    (gt_block_decoder.fill_genotype_array_advance phase_term)."""
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder

    N = 6
    hap = np.full(N, 2, np.int32)
    hap[2] = 4                       # one ALT carrier -> sparse line
    neg = np.full(N, 4, np.int32)
    neg[1] = 2                       # one REF carrier -> negated sparse
    for records in ([(hap, 2)], [(neg, 2)], [(hap, 2), (neg, 2)]):
        enc = GtBlockEncoder(N, block_bcf_lines=10, mac_threshold=2,
                             default_phasing=1, aet_dtype=np.uint16)
        for gt, na in records:
            enc.encode_record(gt, na)
        dec = GtBlockDecoder(enc.serialize(), N, 2 * N, aet_dtype=np.uint16)
        pos = 0
        for gt, na in records:
            dec.seek(pos)
            np.testing.assert_array_equal(
                dec.fill_genotype_array_advance(na), gt)
            pos += na - 1


def test_zero_alt_haploid_record_keeps_line_haploid_key():
    """Review regression (round 3): a clean zero-ALT haploid record owns
    no binary line but still sets haploid_found in the oracle, so the
    device mixed-block assembler must emit KEY_LINE_HAPLOID (all-zero
    flags) or the payload diverges from the host encoders."""
    import pytest
    jax = pytest.importorskip("jax")  # noqa: F841

    from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    N = 6
    dip = np.full(2 * N, 2, np.int32)
    dip[1::2] |= 1
    dip[0] = 4
    hap0 = np.full(N, 2, np.int32)      # haploid, zero-ALT (ALT='.')
    kw = dict(block_bcf_lines=10, mac_threshold=1, default_phasing=1,
              aet_dtype=np.uint16)
    py = GtBlockEncoder(N, **kw)
    dv = DeviceBlockEncoder(N, **kw)
    for gt, na in ((dip, 2), (hap0, 1), (dip, 2)):
        py.encode_record(gt, na)
        dv.encode_record(gt, na)
    assert py.serialize() == dv.serialize()


def test_native_parse_gtless_record_yields_none(tmp_path):
    """Review regression (round 3): a record without FORMAT/GT must come
    back as gt=None (Python reader parity), not a hard parse error —
    bitmap/mutate/phasing consumers skip such records."""
    import os

    from xsqueezeit_tpu.io.bcf import BcfWriter
    from xsqueezeit_tpu.io.unified import GtInput

    vcf = tmp_path / "g.vcf"
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\n"
                "20\t100\t.\tG\tA\t.\t.\t.\tGT\t0|1\t1|1\n")
    inp = GtInput(str(vcf))
    recs = list(inp)
    bcf = str(tmp_path / "g.bcf")
    w = BcfWriter(bcf, inp.header)
    from xsqueezeit_tpu.io.bcf import patch_shared_sample_counts
    from xsqueezeit_tpu.io.sites import encode_gt_indiv
    # record 1: with GT; record 2: NO FORMAT fields at all
    w.write_raw(patch_shared_sample_counts(recs[0].shared, 1, 2),
                encode_gt_indiv(inp.header, recs[0].gt, 2, 2))
    w.write_raw(patch_shared_sample_counts(recs[0].shared, 0, 2), b"")
    w.close()
    inp.close()

    for mode in ("0", "1"):
        os.environ["XSI_NATIVE_PARSE"] = mode
        try:
            got = [(r.gt is None, r.ploidy) for r in GtInput(bcf)]
        finally:
            os.environ.pop("XSI_NATIVE_PARSE", None)
        assert got == [(False, 2), (True, 0)], (mode, got)


def test_native_parse_corrupt_member_raises(tmp_path):
    """Review regression (round 3): a corrupt BGZF member mid-stream must
    raise through the native parser, not silently truncate the stream
    (zero-byte read with error() set is NOT a clean EOF)."""
    import os

    import pytest

    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.io.unified import GtInput

    p = str(tmp_path / "c.bcf")
    synth_bcf(p, 3000, 40)
    data = bytearray(open(p, "rb").read())
    # find a mid-file BGZF member boundary and clobber its gzip magic
    off, members = 0, []
    while off + 18 <= len(data) and data[off] == 0x1F and data[off+1] == 0x8B:
        members.append(off)
        xlen = data[off+10] | (data[off+11] << 8)
        extra = data[off+12:off+12+xlen]
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            slen = extra[i+2] | (extra[i+3] << 8)
            if extra[i] == 0x42 and extra[i+1] == 0x43 and slen == 2:
                bsize = (extra[i+4] | (extra[i+5] << 8)) + 1
                break
            i += 4 + slen
        if bsize is None:
            break
        off += bsize
    assert len(members) > 2, "need a multi-member BGZF file"
    data[members[len(members) // 2]] ^= 0xFF   # bad gzip magic mid-file
    cut = str(tmp_path / "corrupt.bcf")
    open(cut, "wb").write(bytes(data))
    os.environ["XSI_NATIVE_PARSE"] = "1"
    try:
        with pytest.raises((ValueError, OSError)):
            n = 0
            for _ in GtInput(cut):
                n += 1
            assert n == 200  # only reachable if the flip hit dead bytes
    finally:
        os.environ.pop("XSI_NATIVE_PARSE", None)


def test_native_then_python_skip_positions_agree(tmp_path):
    """Review regression (round 3): skip_records after a partial native
    iteration must account for records the native reader consumed (the
    Python reader's position lags otherwise)."""
    import itertools
    import os

    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.io.unified import GtInput

    p = str(tmp_path / "s.bcf")
    synth_bcf(p, 50, 20)
    os.environ["XSI_NATIVE_PARSE"] = "1"
    try:
        inp = GtInput(p)
        first10 = list(itertools.islice(iter(inp), 10))
        assert len(first10) == 10
        assert inp.skip_records(5) == 5
        # force the PYTHON path for the remainder
        os.environ["XSI_NATIVE_PARSE"] = "0"
        rest = list(inp)
        inp.close()
    finally:
        os.environ.pop("XSI_NATIVE_PARSE", None)
    # records 0..9 consumed natively, 10..14 skipped -> 15.. remain
    ref = list(GtInput(p))
    assert len(rest) == 35
    assert bytes(rest[0].shared) == bytes(ref[15].shared)


def test_native_encoder_use_after_serialize_raises():
    import pytest

    from xsqueezeit_tpu.interop.native import NativeBlockEncoder

    enc = NativeBlockEncoder(4, 10, 1, aet_dtype=np.uint16)
    gt = np.full(8, 2, np.int32)
    gt[1::2] |= 1
    enc.encode_record(gt, 2)
    assert enc.bcf_lines == 1
    enc.serialize()
    assert enc.bcf_lines == 1        # still answerable after close
    with pytest.raises(RuntimeError):
        enc.serialize()
    with pytest.raises(RuntimeError):
        enc.encode_record(gt, 2)
