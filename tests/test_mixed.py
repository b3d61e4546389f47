"""Mixed XSI/BCF reader (Xcf) — routing and lockstep equality."""
import numpy as np

from tests import fixtures
from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.mixed import Xcf


def test_xcf_routes_and_matches(tmp_path):
    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=11,
                              n_records=40, seed=31)
    xsi = str(tmp_path / "m.xsi")
    bcf = str(tmp_path / "m.bcf")
    cli_main(["-c", "-f", vcf, "-o", xsi])
    cli_main(["-x", "-f", xsi, "-o", bcf])

    x = Xcf()
    i_var = x.add_reader(xsi + "_var.bcf")   # variant file -> accessor route
    i_bcf = x.add_reader(bcf)                # plain BCF
    i_xsi = x.add_reader(xsi)                # container directly
    assert x[i_var].is_xsi and x[i_xsi].is_xsi and not x[i_bcf].is_xsi
    assert x.sample_names(i_var) == x.sample_names(i_bcf)

    rows_var = [(gt.copy() if gt is not None else None)
                for _, gt in x[i_var]]
    rows_bcf = [(gt.copy() if gt is not None else None)
                for _, gt in x[i_bcf]]
    rows_xsi = [(gt.copy() if gt is not None else None)
                for _, gt in x[i_xsi]]
    assert len(rows_var) == len(rows_bcf) == len(rows_xsi) == 40
    for a, b, c in zip(rows_var, rows_bcf, rows_xsi):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
    x.close()


def test_xcf_internal_access(tmp_path):
    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=9,
                              n_records=20, seed=32)
    xsi = str(tmp_path / "m.xsi")
    cli_main(["-c", "-f", vcf, "-o", xsi])
    x = Xcf()
    i = x.add_reader(xsi)
    reader = x[i].reader
    rec = reader.read_record()
    ia = x[i].get_internal_access(rec)
    assert ia.a.shape[0] == 18
    x.close()


def test_af_stats_annotate(tmp_path):
    from xsqueezeit_tpu.bench.tools import af_stats
    from xsqueezeit_tpu.io.bcf import BcfReader
    from xsqueezeit_tpu.io.sites import render_vcf_cols
    vcf = fixtures.random_vcf(str(tmp_path / "in.vcf"), n_samples=10,
                              n_records=15, seed=33)
    xsi = str(tmp_path / "a.xsi")
    cli_main(["-c", "-f", vcf, "-o", xsi])
    out = str(tmp_path / "annot.bcf")
    stats = af_stats(xsi, annotate_out=out)
    reader = BcfReader(out)
    n = 0
    for rec, (an, acs) in zip(reader, stats["stats"]):
        cols = render_vcf_cols(reader.header, rec)
        assert f"AN={an}" in cols[7]
        assert "AC=" + ",".join(str(c) for c in acs) in cols[7]
        n += 1
    reader.close()
    assert n == 15
