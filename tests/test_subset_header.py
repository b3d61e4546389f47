"""Sample-subset outputs must be self-consistent ON DISK.

Round-4 regression class: `-s` recomputes AC/AN (reference parity,
gt_decompressor_new.hpp:324-365) but the tags were declared via
ensure_string AFTER the output header had been serialized, so `-x -s -O b`
wrote BCFs whose INFO dictionary indices exceeded the on-disk header's
string table, `-O x -s` wrote the same dangling indices into `_var.bcf`,
and `-O v -s` emitted AC=/AN= under a header with zero ##INFO lines.

These tests round-trip subset outputs THROUGH DISK and render ALL columns
(not just GT) with the repo's own readers, on an input whose header has no
INFO declarations at all (the trigger).  They also pin the writer-side
invariant: declaring a new dictionary key after the header bytes went out
is a hard error (the htslib behavior the reference relies on,
gt_decompressor_new.hpp:251-252).
"""
import re

import numpy as np
import pytest

from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.io.bcf import BcfHeader, BcfReader, BcfWriter
from xsqueezeit_tpu.io.sites import render_vcf_cols
from tests import fixtures


def _compress_bare(tmp_path, n_samples=10, n_records=40, seed=7):
    vcf = fixtures.random_vcf(str(tmp_path / "bare.vcf"),
                              n_samples=n_samples, n_records=n_records,
                              seed=seed, bare_header=True)
    xsi = str(tmp_path / "bare.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    return vcf, xsi


def _read_bcf_all_columns(path):
    """Re-read a BCF from disk and render EVERY column; any dangling
    dictionary index raises inside render_vcf_cols/genotypes."""
    r = BcfReader(path)
    rows = []
    for rec in r:
        cols = render_vcf_cols(r.header, rec)
        gt = rec.genotypes()
        rows.append((cols, None if gt is None else gt[0].tolist()))
    header = r.header
    r.close()
    return header, rows


def _parse_vcf_text(path):
    import gzip
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        lines = f.read().splitlines()
    meta = [l for l in lines if l.startswith("##")]
    body = [l for l in lines if l and not l.startswith("#")]
    return meta, body


def _assert_info_declared(meta, body):
    declared = {m.group(1) for l in meta
                if (m := re.search(r"^##INFO=<ID=([^,>]+)", l))}
    for line in body:
        info = line.split("\t")[7]
        if info == ".":
            continue
        for item in info.split(";"):
            key = item.split("=", 1)[0]
            assert key in declared, f"undeclared INFO key {key} in: {line}"


def _expect_acan(vcf_path, keep):
    """Expected (AC tuple, AN) per record for a subset, from the input text."""
    meta, body = _parse_vcf_text(vcf_path)
    header_cols = [l for l in open(vcf_path) if l.startswith("#CHROM")][0]
    samples = header_cols.rstrip("\n").split("\t")[9:]
    idx = [samples.index(s) for s in keep]
    out = []
    for line in body:
        cols = line.split("\t")
        n_alt = len(cols[4].split(","))
        counts = np.zeros(n_alt + 1, np.int64)
        an = 0
        for i in idx:
            for a in re.split(r"[|/]", cols[9 + i]):
                if a != ".":
                    counts[int(a)] += 1
                    an += 1
        out.append((tuple(int(c) for c in counts[1:]), an))
    return out


@pytest.mark.parametrize("ot,ext", [("b", "bcf"), ("u", "ubcf"),
                                    ("v", "vcf"), ("z", "vcf.gz")])
def test_subset_output_reads_back_all_columns(tmp_path, ot, ext):
    vcf, xsi = _compress_bare(tmp_path)
    keep = ["S003", "S001", "S007"]
    out = str(tmp_path / f"sub.{ext}")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-s", ",".join(keep),
                     "-O", ot]) == 0
    expect = _expect_acan(vcf, keep)
    if ot in ("b", "u"):
        header, rows = _read_bcf_all_columns(out)
        assert "AC" in header.str2idx and "AN" in header.str2idx
        declared = {m.group(1) for l in header.lines
                    if (m := re.search(r"^##INFO=<ID=([^,>]+)", l))}
        assert {"AC", "AN"} <= declared
        assert len(rows) == len(expect)
        for (cols, gt), (ac, an) in zip(rows, expect):
            info = dict(kv.split("=", 1) for kv in cols[7].split(";")
                        if "=" in kv)
            assert int(info["AN"]) == an
            got_ac = tuple(int(x) for x in info.get("AC", "").split(",")) \
                if "AC" in info else ()
            assert got_ac == ac or (not ac and not got_ac)
    else:
        meta, body = _parse_vcf_text(out)
        _assert_info_declared(meta, body)
        assert len(body) == len(expect)
        for line, (ac, an) in zip(body, expect):
            info = dict(kv.split("=", 1)
                        for kv in line.split("\t")[7].split(";") if "=" in kv)
            assert int(info["AN"]) == an


def test_subset_recompress_then_extract(tmp_path):
    """-O x -s writes a _var.bcf whose header declares the patched tags;
    a later -O v extract of that XSI must succeed and render everything."""
    vcf, xsi = _compress_bare(tmp_path, n_samples=12, n_records=60)
    keep = "S002,S005,S009"
    xsi2 = str(tmp_path / "sub.xsi")
    assert cli_main(["-x", "-f", xsi, "-o", xsi2, "-O", "x", "-s", keep]) == 0
    # the _var.bcf itself re-renders from disk
    _read_bcf_all_columns(xsi2 + "_var.bcf")
    out = str(tmp_path / "sub_from_x.vcf")
    assert cli_main(["-x", "-f", xsi2, "-o", out, "-O", "v"]) == 0
    meta, body = _parse_vcf_text(out)
    _assert_info_declared(meta, body)
    # equals the direct -s -O v extraction, record for record
    direct = str(tmp_path / "sub_direct.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", direct, "-s", keep,
                     "-O", "v"]) == 0
    _, direct_body = _parse_vcf_text(direct)
    assert body == direct_body


def test_subset_negation_and_existing_decls(tmp_path):
    """^-negation subset on an input that DOES declare AC/AN: values are
    recomputed, declarations not duplicated."""
    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=8,
                              n_records=30, seed=3)
    xsi = str(tmp_path / "in.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    out = str(tmp_path / "neg.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-s", "^S000,S004",
                     "-O", "v"]) == 0
    meta, body = _parse_vcf_text(out)
    _assert_info_declared(meta, body)
    assert sum(1 for l in meta if "##INFO=<ID=AC" in l) == 1
    assert sum(1 for l in meta if "##INFO=<ID=AN" in l) == 1
    expect = _expect_acan(vcf, [f"S00{i}" for i in (1, 2, 3, 5, 6, 7)])
    for line, (ac, an) in zip(body, expect):
        info = dict(kv.split("=", 1)
                    for kv in line.split("\t")[7].split(";") if "=" in kv)
        assert int(info["AN"]) == an


def test_bm_format_dropped_on_plain_extract(tmp_path):
    """Reference parity: plain extraction removes the BM FORMAT
    declaration (gt_decompressor_new.hpp:506-507); -O x keeps it in the
    new _var.bcf."""
    _, xsi = _compress_bare(tmp_path)
    out = str(tmp_path / "plain.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-O", "v"]) == 0
    meta, _ = _parse_vcf_text(out)
    assert not any("ID=BM" in l for l in meta)
    xsi2 = str(tmp_path / "re.xsi")
    assert cli_main(["-x", "-f", xsi, "-o", xsi2, "-O", "x"]) == 0
    r = BcfReader(xsi2 + "_var.bcf")
    assert "BM" in r.header.str2idx
    r.close()


def test_writer_refuses_late_dictionary_growth(tmp_path):
    header = BcfHeader.from_text(fixtures.HEADER_BARE
                                 + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                                   "FILTER\tINFO\tFORMAT\tS0\n")
    w = BcfWriter(str(tmp_path / "x.bcf"), header)
    with pytest.raises(ValueError, match="already serialized"):
        header.ensure_string("AC", "##INFO=<ID=AC,Number=A,Type=Integer,"
                                   'Description="x">')
    with pytest.raises(ValueError, match="already serialized"):
        header.ensure_contig("chr99")
    # growth through an ALIASED header object is caught at the record
    alias = BcfHeader.from_text(header.to_text())
    alias.dict_strings = header.dict_strings
    alias.str2idx = header.str2idx
    alias.ensure_string("ZZ")
    with pytest.raises(ValueError, match="dictionary grew"):
        w.write_raw(b"\0" * 24, b"")
    w._f.close()
