"""Accessor API + bench/validation tools."""
import numpy as np
import pytest

from xsqueezeit_tpu.accessor import Accessor
from xsqueezeit_tpu.bench import tools
from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.io.bcf import BcfReader
from tests import fixtures


@pytest.fixture(scope="module")
def compressed(tmp_path_factory):
    td = tmp_path_factory.mktemp("acc")
    vcf = fixtures.random_vcf(str(td / "in.vcf"), n_samples=30, n_records=120,
                              seed=9, p_multi=0.15)
    xsi = str(td / "o.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi,
                     "--variant-block-length", "50", "--maf", "0.02"]) == 0
    return vcf, xsi


def test_accessor_random_access(compressed):
    vcf, xsi = compressed
    acc = Accessor(xsi)
    assert len(acc.get_sample_list()) == 30
    from xsqueezeit_tpu.io.unified import GtInput
    orig = [(r.n_alleles, r.gt) for r in GtInput(vcf)]
    reader = BcfReader(acc.variant_filename())
    recs = list(reader)
    # random order access incl. cross-block jumps
    order = [5, 60, 3, 119, 55, 0, 80, 49, 50]
    for i in order:
        gt = acc.get_genotypes(recs[i])
        np.testing.assert_array_equal(gt, orig[i][1], err_msg=f"record {i}")


def test_accessor_allele_counts(compressed):
    vcf, xsi = compressed
    acc = Accessor(xsi)
    reader = BcfReader(acc.variant_filename())
    from xsqueezeit_tpu.io.unified import GtInput
    for rec, orig in zip(reader, GtInput(vcf)):
        counts = acc.get_allele_counts(rec)
        alleles = (orig.gt >> 1) - 1
        want = np.bincount(alleles[alleles >= 0], minlength=orig.n_alleles)
        np.testing.assert_array_equal(counts, want)


def test_loading_time_tool(compressed):
    vcf, xsi = compressed
    a = tools.loading_time(vcf)
    b = tools.loading_time(xsi)
    assert a["records"] == b["records"] == 120
    assert a["gt_entries"] == b["gt_entries"]


def test_dot_prod_checksums_match(compressed):
    vcf, xsi = compressed
    a = tools.dot_prod(vcf)
    b = tools.dot_prod(xsi)
    assert a["variants"] == b["variants"]
    assert abs(a["checksum"] - b["checksum"]) < 1e-6


def test_af_stats_match(compressed):
    vcf, xsi = compressed
    a = tools.af_stats(vcf)
    b = tools.af_stats(xsi)
    assert a["stats"] == b["stats"]


def test_lockstep(compressed, tmp_path):
    vcf, xsi = compressed
    out = tools.lockstep_load(vcf, xsi)
    assert out["identical"] and out["records"] == 120
    # and a mutated file fails
    bad = str(tmp_path / "bad.vcf")
    with open(vcf) as f:
        text = f.read()
    with open(bad, "w") as f:
        f.write(text.replace("0|1", "1|1", 1))
    with pytest.raises(AssertionError):
        tools.lockstep_load(bad, xsi)


def test_internal_access(compressed):
    vcf, xsi = compressed
    acc = Accessor(xsi)
    reader = BcfReader(acc.variant_filename())
    rec = next(iter(reader))
    ia = acc.get_internal_access(acc.position_from_bm_entry(rec), rec.n_allele)
    assert len(ia.sparse) == rec.n_allele - 1
    assert len(ia.pointers) == rec.n_allele - 1
    assert ia.a.shape[0] == acc.n_haps
