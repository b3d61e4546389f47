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
