"""End-to-end round trip through the device (JAX) encode and decode paths."""
import numpy as np
import pytest

pytest.importorskip("jax")

from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.codec.compressor import CompressorOptions, compress_file
from xsqueezeit_tpu.codec.decompressor import Decompressor, DecompressorOptions
from tests import fixtures
from tests.test_e2e import read_all


def test_device_roundtrip(tmp_path):
    vcf = fixtures.random_vcf(str(tmp_path / "r.vcf"), n_samples=64,
                              n_records=200, seed=42)
    xsi = str(tmp_path / "o.xsi")
    out = str(tmp_path / "o.vcf")
    compress_file(vcf, xsi, CompressorOptions(device="jax", block_length=100,
                                              maf=0.01))
    d = Decompressor(xsi, DecompressorOptions(output_type="v", device="jax"))
    d.decompress(out)
    orig, _ = read_all(vcf)
    got, _ = read_all(out)
    assert orig == got


def test_device_vs_numpy_identical_files(tmp_path):
    vcf = fixtures.random_vcf(str(tmp_path / "r.vcf"), n_samples=64,
                              n_records=200, seed=43)
    a = str(tmp_path / "a.xsi")
    b = str(tmp_path / "b.xsi")
    compress_file(vcf, a, CompressorOptions(device="jax", block_length=100,
                                            maf=0.01))
    compress_file(vcf, b, CompressorOptions(device="numpy", block_length=100,
                                            maf=0.01))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_filtered_device_decode_matches_host(tmp_path, monkeypatch):
    """Region/target-filtered runs batch whole blocks on the device path
    with explicit per-record offsets (non-contiguous subsets)."""
    import os
    from tests import fixtures
    from xsqueezeit_tpu.cli import main as cli_main

    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=21,
                              n_records=90, seed=51)
    xsi = str(tmp_path / "f.xsi")
    monkeypatch.setenv("XSI_DEVICE", "numpy")
    cli_main(["-c", "-f", vcf, "-o", xsi, "--variant-block-length", "32"])
    host = str(tmp_path / "h.vcf")
    cli_main(["-x", "-f", xsi, "-o", host, "-r", "20:60200-61500"])
    monkeypatch.setenv("XSI_DEVICE", "jax")
    dev = str(tmp_path / "d.vcf")
    cli_main(["-x", "-f", xsi, "-o", dev, "-r", "20:60200-61500"])
    assert open(dev).read() == open(host).read()
