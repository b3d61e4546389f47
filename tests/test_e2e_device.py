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


# ---------------------------------------------------------------------------
# Uniformly-haploid blocks on device (round-1 VERDICT item 6)
# ---------------------------------------------------------------------------
def _haploid_records(rng, n_samples, n_records):
    """All-haploid records (chrX male panel shape): one slot per sample."""
    recs = []
    for _ in range(n_records):
        p = rng.choice([0.002, 0.05, 0.4, 0.9, 0.999])
        alleles = (rng.random(n_samples) < p).astype(np.int32)
        recs.append(((alleles + 1) << 1, 2))
    return recs


def test_haploid_device_encoder_matches_numpy():
    from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    rng = np.random.default_rng(61)
    n_samples = 90
    recs = _haploid_records(rng, n_samples, 40)
    kw = dict(n_samples=n_samples, block_bcf_lines=64, mac_threshold=3,
              default_phasing=0, aet_dtype=np.uint16)
    enc_np, enc_dev = GtBlockEncoder(**kw), DeviceBlockEncoder(**kw)
    for gt, na in recs:
        enc_np.encode_record(gt, na)
        enc_dev.encode_record(gt, na)
    assert enc_np.serialize() == enc_dev.serialize()


def test_haploid_device_decoder_matches_numpy():
    from xsqueezeit_tpu.codec.decoder_jax import (
        DeviceBlockDecoder,
        decode_block_records,
    )
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder

    rng = np.random.default_rng(62)
    n_samples = 70
    recs = _haploid_records(rng, n_samples, 30)
    enc = GtBlockEncoder(n_samples=n_samples, block_bcf_lines=64,
                         mac_threshold=3, default_phasing=0,
                         aet_dtype=np.uint16)
    for gt, na in recs:
        enc.encode_record(gt, na)
    payload = enc.serialize()

    dev = DeviceBlockDecoder(payload, n_samples, n_samples * 2, np.uint16)
    assert dev.uniform_haploid and dev.eligible
    got = decode_block_records(payload, n_samples, n_samples * 2, np.uint16,
                               [na for _, na in recs])
    oracle = GtBlockDecoder(payload, n_samples, n_samples * 2, np.uint16)
    for i, (gt_in, na) in enumerate(recs):
        want = oracle.fill_genotype_array_advance(na)
        np.testing.assert_array_equal(got[i], want, err_msg=f"record {i}")
        np.testing.assert_array_equal(want, gt_in, err_msg=f"record {i}")


def test_haploid_device_e2e_roundtrip(tmp_path):
    """All-haploid VCF through the forced device path, both directions."""
    rng = np.random.default_rng(63)
    n_samples, n_records = 33, 120
    p = tmp_path / "hap.vcf"
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=X,length=155270560>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(f"M{i}" for i in range(n_samples)) + "\n")
        for i in range(n_records):
            freq = rng.choice([0.01, 0.3, 0.97])
            cells = "\t".join(str(int(rng.random() < freq))
                              for _ in range(n_samples))
            f.write(f"X\t{60000+i*10}\trs{i}\tG\tA\t.\tPASS\t.\tGT\t{cells}\n")
    xsi_dev = str(tmp_path / "dev.xsi")
    xsi_np = str(tmp_path / "np.xsi")
    compress_file(str(p), xsi_dev, CompressorOptions(device="jax",
                                                     block_length=48,
                                                     maf=0.05))
    compress_file(str(p), xsi_np, CompressorOptions(device="numpy",
                                                    block_length=48,
                                                    maf=0.05))
    assert open(xsi_dev, "rb").read() == open(xsi_np, "rb").read()
    out = str(tmp_path / "rt.vcf")
    Decompressor(xsi_dev, DecompressorOptions(output_type="v",
                                              device="jax")).decompress(out)
    orig, _ = read_all(str(p))
    got, _ = read_all(out)
    assert orig == got
