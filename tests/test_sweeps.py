"""Config sweeps: maf thresholds, zstd levels, block-length edges
(SURVEY.md build-plan stage 7 hardening)."""
import pytest

from tests import fixtures
from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.io.unified import GtInput


def _read(path):
    inp = GtInput(path)
    out = [(r.n_alleles, None if r.gt is None else r.gt.tolist(), r.ploidy)
           for r in inp]
    inp.close()
    return out


@pytest.fixture(scope="module")
def vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sweep")
    return fixtures.random_vcf(str(d / "in.vcf"), n_samples=25,
                               n_records=120, seed=21)


@pytest.mark.parametrize("maf", ["0.0", "0.01", "0.2", "0.5"])
def test_maf_sweep(vcf, tmp_path, maf):
    xsi = str(tmp_path / "o.xsi")
    out = str(tmp_path / "o.vcf")
    assert cli_main(["-c", "-f", vcf, "-o", xsi, "--maf", maf]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", out]) == 0
    assert _read(out) == _read(vcf)


@pytest.mark.parametrize("level", ["1", "7", "19"])
def test_zstd_level_sweep(vcf, tmp_path, level):
    xsi = str(tmp_path / "o.xsi")
    out = str(tmp_path / "o.vcf")
    assert cli_main(["-c", "-f", vcf, "-o", xsi, "--zstd",
                     "--zstd-level", level]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", out]) == 0
    assert _read(out) == _read(vcf)


@pytest.mark.parametrize("bl", ["1", "3", "120", "8192"])
def test_block_length_edges(vcf, tmp_path, bl):
    """block length 1 (one record per block), odd size, exact fit, default."""
    xsi = str(tmp_path / "o.xsi")
    out = str(tmp_path / "o.vcf")
    assert cli_main(["-c", "-f", vcf, "-o", xsi,
                     "--variant-block-length", bl]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", out]) == 0
    assert _read(out) == _read(vcf)


def test_zstd_region_and_samples(vcf, tmp_path):
    xsi = str(tmp_path / "o.xsi")
    out = str(tmp_path / "o.vcf")
    cli_main(["-c", "-f", vcf, "-o", xsi, "--zstd",
              "--variant-block-length", "32"])
    cli_main(["-x", "-f", xsi, "-o", out, "-r", "20:60300-61500",
              "-s", "S003,S001"])
    rows = _read(out)
    orig = _read(vcf)
    keep = [i for i in range(120) if 60300 <= 60000 + i * 37 <= 61500]
    assert len(rows) == len(keep)


def test_e2e_bench_tool_small():
    """The file-level wall-clock bench tool itself (synth -> compress ->
    extract -> verify) on a tiny workload, host path."""
    from xsqueezeit_tpu.bench.e2e import run

    out = run(n_records=400, n_samples=40, device="numpy")
    assert out["records"] == 400
    assert out["compress_mb_s"] > 0 and out["extract_mb_s"] > 0
    assert out["xsi_mb"] < out["logical_mb"]
