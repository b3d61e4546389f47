"""Native whole-file extract (native/xsi_extract.cpp + bcf_emit.cpp).

The native loop re-implements the reference's decompress_inner_loop
(/root/reference/include/gt_decompressor_new.hpp:158-206) over the native
accessor + emitter.  In zlib mode (XSI_EMIT_ZLIB=1) its output must be
byte-identical to the Python writer (io/bcf.py BcfWriter + io/sites.py
encode_gt_indiv); in the default libdeflate mode the BGZF payload bytes
differ but the decompressed record stream must be identical.
"""
import os

import numpy as np
import pytest

from xsqueezeit_tpu.codec.compressor import CompressorOptions, compress_file
from xsqueezeit_tpu.codec.decompressor import Decompressor, DecompressorOptions

from tests import fixtures

pytestmark = pytest.mark.skipif(
    os.environ.get("XSI_SKIP_NATIVE") == "1", reason="native build disabled")


def _native_extract(xsi, out, level=6):
    from xsqueezeit_tpu.interop.native import native_extract

    d = Decompressor(xsi, DecompressorOptions(device="numpy"))
    h = d.output_header()
    gt_key = h.ensure_string(
        "GT", '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
    return native_extract(xsi, out, h.to_text().encode() + b"\0", gt_key,
                          level)


def _python_extract(xsi, out, output_type="b"):
    opts = DecompressorOptions(device="numpy", output_type=output_type)
    return Decompressor(xsi, opts).decompress(out)


CASES = [
    ("micro_missing", {}),
    ("micro_eov", {}),
    ("micro_haploid", {}),
    ("micro_mixed_ploidy", {}),
    ("micro_non_uniform_phase", {}),
    ("micro_missing_non_uniform_phasing", {}),
    ("random", {}),
    ("random_zstd", dict(zstd=True, block_length=64)),
]


def _make_xsi(tmp_path, name, copts):
    vcf = str(tmp_path / "in.vcf")
    if name.startswith("random"):
        fixtures.random_vcf(vcf, n_samples=33, n_records=150, seed=11,
                            p_multi=0.2)
    else:
        fixtures.ALL_MICRO[name](vcf)
    xsi = str(tmp_path / "out.xsi")
    compress_file(vcf, xsi, CompressorOptions(**copts))
    return xsi


@pytest.mark.parametrize("name,copts", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.parametrize("level", [6, 0], ids=["Ob", "Ou"])
def test_byte_identity_zlib_mode(tmp_path, monkeypatch, name, copts, level):
    """zlib-mode native output == Python writer output, byte for byte."""
    xsi = _make_xsi(tmp_path, name, copts)
    py = str(tmp_path / "py.bcf")
    nat = str(tmp_path / "nat.bcf")
    _python_extract(xsi, py, output_type="u" if level == 0 else "b")
    monkeypatch.setenv("XSI_EMIT_ZLIB", "1")
    n = _native_extract(xsi, nat, level=level)
    assert n > 0
    a = open(py, "rb").read()
    b = open(nat, "rb").read()
    assert a == b


def test_libdeflate_mode_content_identity(tmp_path, monkeypatch):
    """Default (libdeflate) mode: different BGZF bytes, same records."""
    monkeypatch.delenv("XSI_EMIT_ZLIB", raising=False)
    xsi = _make_xsi(tmp_path, "random", {})
    py = str(tmp_path / "py.bcf")
    nat = str(tmp_path / "nat.bcf")
    _python_extract(xsi, py)
    _native_extract(xsi, nat)

    from xsqueezeit_tpu.io.unified import GtInput
    a, b = GtInput(py), GtInput(nat)
    n = 0
    for ra, rb in zip(a, b):
        assert np.array_equal(ra.gt, rb.gt)
        n += 1
    assert n == 150
    a.close()
    b.close()


def test_decompressor_auto_routes_native(tmp_path, monkeypatch):
    """With device=auto and no filters, _decompress_to_bcf takes the native
    loop (observed by patching the binding)."""
    xsi = _make_xsi(tmp_path, "random", {})
    monkeypatch.setenv("XSI_DEVICE", "auto")

    import xsqueezeit_tpu.interop.native as native_mod
    calls = []
    real = native_mod.native_extract

    def spy(*args, **kw):
        calls.append(args)
        return real(*args, **kw)

    monkeypatch.setattr(native_mod, "native_extract", spy)
    out = str(tmp_path / "out.bcf")
    stats = Decompressor(xsi, DecompressorOptions()).decompress(out)
    assert stats["records"] == 150
    assert len(calls) == 1

    # filters must bypass the native loop (Python path handles them)
    calls.clear()
    out2 = str(tmp_path / "sub.bcf")
    Decompressor(xsi, DecompressorOptions(samples="S001,S002")).decompress(out2)
    assert not calls


def test_emitter_binding_matches_python_writer(tmp_path, monkeypatch):
    """The ctypes NativeBcfEmitter reproduces BcfWriter bytes exactly."""
    from xsqueezeit_tpu.interop.native import NativeBcfEmitter
    from xsqueezeit_tpu.io.bcf import (
        BcfHeader,
        BcfWriter,
        pack_type_descriptor,
        pack_typed_int,
    )
    from xsqueezeit_tpu.io.sites import encode_shared_from_vcf_cols

    monkeypatch.setenv("XSI_EMIT_ZLIB", "1")
    h = BcfHeader.from_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=20>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC")
    gt_key = h.str2idx["GT"]
    prefix = pack_typed_int(gt_key) + pack_type_descriptor(1, 2)
    rng = np.random.default_rng(0)
    shared_blobs = []
    rows = rng.integers(2, 6, size=(40, 6)).astype(np.uint8)
    for i in range(40):
        shared_blobs.append(encode_shared_from_vcf_cols(
            h, ["20", str(1000 + i), ".", "A", "C", ".", "PASS", "."],
            n_fmt=1, n_sample=3))

    py = str(tmp_path / "py.bcf")
    w = BcfWriter(py, h)
    for i, sh in enumerate(shared_blobs):
        w.write_raw(sh, prefix + rows[i].tobytes(), want_offsets=False)
    w.close()

    nat = str(tmp_path / "nat.bcf")
    text = h.to_text().encode() + b"\0"
    e = NativeBcfEmitter(nat, text, level=6)
    shared_cat = b"".join(shared_blobs)
    off = np.zeros(41, np.uint64)
    off[1:] = np.cumsum([len(s) for s in shared_blobs])
    e.write_batch(shared_cat, off, prefix, rows)
    e.close()

    assert open(py, "rb").read() == open(nat, "rb").read()


def test_native_extract_missing_var_file(tmp_path):
    xsi = _make_xsi(tmp_path, "random", {})
    os.rename(xsi + "_var.bcf", xsi + "_var.gone")
    with pytest.raises(OSError):
        _native_extract(xsi, str(tmp_path / "o.bcf"))


def test_native_region_target_extract_matches_python(tmp_path, monkeypatch):
    """-O b region/target extracts through xsi_extract_ranges must yield
    exactly the Python driver's record set (CSI chunk seek + overlap
    rules; htslib semantics via xcf.cpp:115-139)."""
    from tests import fixtures
    from xsqueezeit_tpu.cli import main as cli
    from xsqueezeit_tpu.io.bcf import BcfReader

    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=21,
                              n_records=300, seed=5, p_multi=0.2)
    xsi = str(tmp_path / "f.xsi")
    assert cli(["-c", "-f", vcf, "-o", xsi,
                "--variant-block-length", "64"]) == 0

    def recs(p):
        r = BcfReader(p)
        out = [(bytes(rec.shared), bytes(rec.indiv)) for rec in r]
        r.close()
        return out

    monkeypatch.delenv("XSI_DEVICE", raising=False)
    cases = [("-r", "20:60500-61000"), ("-r", "20:60000-60100,20:62000-62300"),
             ("-r", "20"), ("-r", "20:62000-"), ("-r", "19:1-100"),
             ("-t", "20:60500-61000"), ("-t", "19")]
    for flag, spec in cases:
        monkeypatch.setenv("XSI_NATIVE", "0")
        assert cli(["-x", "-f", xsi, "-o", str(tmp_path / "py.bcf"),
                    "-O", "b", flag, spec]) == 0
        monkeypatch.setenv("XSI_NATIVE", "1")
        assert cli(["-x", "-f", xsi, "-o", str(tmp_path / "nt.bcf"),
                    "-O", "b", flag, spec]) == 0
        a, b = recs(str(tmp_path / "py.bcf")), recs(str(tmp_path / "nt.bcf"))
        assert a == b, (flag, spec, len(a), len(b))


def test_python_driver_decode_via_native_accessor(tmp_path, monkeypatch):
    """The Python-driver extract paths (-O v, -s) route per-record decode
    through the native accessor when the env allows; output must equal
    the pure-Python decoder's byte for byte."""
    from tests import fixtures
    from xsqueezeit_tpu.cli import main as cli
    from xsqueezeit_tpu.codec.decompressor import (
        Decompressor,
        DecompressorOptions,
    )

    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=23,
                              n_records=150, seed=8, p_multi=0.2)
    xsi = str(tmp_path / "f.xsi")
    assert cli(["-c", "-f", vcf, "-o", xsi,
                "--variant-block-length", "32"]) == 0

    outs = {}
    for tag, env in (("nat", None), ("py", "numpy")):
        if env:
            monkeypatch.setenv("XSI_DEVICE", env)
        else:
            monkeypatch.delenv("XSI_DEVICE", raising=False)
        d = Decompressor(xsi, DecompressorOptions(output_type="v",
                                                  device="numpy"))
        out = str(tmp_path / f"{tag}.vcf")
        d.decompress(out)
        if not env:
            assert d._native_accessor() is not False, \
                "native accessor should have engaged"
        outs[tag] = open(out).read()
        s = str(tmp_path / f"{tag}.s.vcf")
        from xsqueezeit_tpu.format.container import XsiReader
        subset = ",".join(XsiReader(xsi).samples[1:6])
        Decompressor(xsi, DecompressorOptions(
            output_type="v", samples=subset, device="numpy")).decompress(s)
        outs[tag + "-s"] = open(s).read()
    assert outs["nat"] == outs["py"]
    assert outs["nat-s"] == outs["py-s"]
