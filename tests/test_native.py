"""Native C++ accessor vs Python decoder: lockstep bit-exactness."""
import shutil
import subprocess

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from xsqueezeit_tpu.cli import main as cli_main
from xsqueezeit_tpu.interop.native import NativeAccessor, build_native
from xsqueezeit_tpu.io.unified import GtInput
from tests import fixtures


@pytest.fixture(scope="module", params=["plain", "zstd"])
def compressed(request, tmp_path_factory):
    td = tmp_path_factory.mktemp("native")
    vcf = fixtures.random_vcf(str(td / "in.vcf"), n_samples=22, n_records=90,
                              seed=17, p_multi=0.2)
    xsi = str(td / "o.xsi")
    args = ["-c", "-f", vcf, "-o", xsi, "--variant-block-length", "40",
            "--maf", "0.03"]
    if request.param == "zstd":
        args.append("--zstd")
    assert cli_main(args) == 0
    return vcf, xsi


def test_native_lockstep(compressed):
    vcf, xsi = compressed
    acc = NativeAccessor(xsi)
    assert acc.n_samples == 22
    assert acc.sample_name(0) == "S000"
    native = list(acc)
    acc.close()
    orig = [(r.n_alleles, r.gt) for r in GtInput(vcf)]
    assert len(native) == len(orig)
    for i, ((na_n, gt_n), (na_o, gt_o)) in enumerate(zip(native, orig)):
        assert na_n == na_o, f"record {i}"
        np.testing.assert_array_equal(gt_n, gt_o, err_msg=f"record {i}")


def test_native_micro_fixtures(tmp_path):
    for name in ("micro_missing", "micro_non_uniform_phase", "micro_eov"):
        vcf = fixtures.ALL_MICRO[name](str(tmp_path / f"{name}.vcf"))
        xsi = str(tmp_path / f"{name}.xsi")
        assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
        acc = NativeAccessor(xsi)
        native = list(acc)
        acc.close()
        orig = [(r.n_alleles, r.gt) for r in GtInput(vcf)]
        for i, ((na_n, gt_n), (na_o, gt_o)) in enumerate(zip(native, orig)):
            assert na_n == na_o
            np.testing.assert_array_equal(gt_n, gt_o,
                                          err_msg=f"{name} record {i}")


def test_c_program(compressed, tmp_path):
    """Compile and run the C API test program end-to-end."""
    vcf, xsi = compressed
    import os
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    subprocess.run(["make", "-C", native_dir, "c_api_test"], check=True,
                   capture_output=True)
    out = subprocess.run([os.path.join(native_dir, "c_api_test"), xsi],
                         check=True, capture_output=True, text=True).stdout
    assert "records_read=90" in out
    total = 0
    for r in GtInput(vcf):
        total += int(r.gt.astype(np.int64).sum())
    assert f"gt_checksum={total}" in out
