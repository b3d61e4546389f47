"""CLI error containment: user-level failures exit nonzero with a one-line
diagnostic instead of a traceback (reference parity: codec throws are caught
in main, /root/reference/xsqueezeit.cpp:123-126,138-141,183-186)."""
import os

import pytest

from xsqueezeit_tpu.cli import main as cli_main
from tests import fixtures


@pytest.fixture(autouse=True)
def _no_debug(monkeypatch):
    monkeypatch.delenv("XSI_DEBUG", raising=False)


def _assert_one_line_error(capsys):
    err = capsys.readouterr().err
    assert "Traceback" not in err
    assert "xsqueezeit: error:" in err
    return err


def test_missing_input_file(tmp_path, capsys):
    rc = cli_main(["-x", "-f", str(tmp_path / "nope.xsi"),
                   "-o", str(tmp_path / "out.bcf")])
    assert rc != 0
    _assert_one_line_error(capsys)


def test_missing_compress_input(tmp_path, capsys):
    rc = cli_main(["-c", "-f", str(tmp_path / "nope.vcf"),
                   "-o", str(tmp_path / "out.xsi")])
    assert rc != 0
    _assert_one_line_error(capsys)


def test_corrupt_xsi(tmp_path, capsys):
    bad = tmp_path / "bad.xsi"
    bad.write_bytes(b"\x00" * 300)
    rc = cli_main(["-x", "-f", str(bad), "-o", str(tmp_path / "out.bcf")])
    assert rc != 0
    _assert_one_line_error(capsys)


def test_truncated_xsi(tmp_path, capsys):
    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    data = open(xsi, "rb").read()
    with open(xsi, "wb") as f:
        f.write(data[:180])
    rc = cli_main(["-x", "-f", xsi, "-o", str(tmp_path / "out.bcf")])
    assert rc != 0
    _assert_one_line_error(capsys)


def test_unknown_sample(tmp_path, capsys):
    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    rc = cli_main(["-x", "-f", xsi, "-o", str(tmp_path / "out.bcf"),
                   "-s", "NOSUCH"])
    assert rc != 0
    err = _assert_one_line_error(capsys)
    assert "NOSUCH" in err


def test_bad_region_string(tmp_path, capsys):
    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    rc = cli_main(["-x", "-f", xsi, "-o", str(tmp_path / "out.bcf"),
                   "-r", "20:abc-:"])
    assert rc != 0
    _assert_one_line_error(capsys)


def test_empty_ox_selection(tmp_path, capsys):
    """-O x with a region matching nothing mirrors the reference's throw —
    contained to a one-line error, nonzero exit."""
    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    rc = cli_main(["-x", "-f", xsi, "-o", str(tmp_path / "sub.xsi"),
                   "-O", "x", "-r", "20:1-2"])
    assert rc != 0
    _assert_one_line_error(capsys)
    assert not os.path.exists(tmp_path / "sub.xsi")


def test_zero_block_length(tmp_path, capsys):
    """--variant-block-length 0 used to reach the compress loop and die
    on a modulo-by-zero traceback (found by CLI probing, round 5)."""
    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    rc = cli_main(["-c", "-f", vcf, "-o", str(tmp_path / "m.xsi"),
                   "--variant-block-length", "0"])
    assert rc != 0
    err = capsys.readouterr().err
    assert "Traceback" not in err
    assert "variant-block-length" in err


def test_zero_block_length_library():
    """Library callers get the same guard from CompressorOptions itself."""
    from xsqueezeit_tpu.codec.compressor import CompressorOptions
    with pytest.raises(ValueError):
        CompressorOptions(block_length=0)


def test_xsi_debug_reraises(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("XSI_DEBUG", "1")
    with pytest.raises(Exception):
        cli_main(["-x", "-f", str(tmp_path / "nope.xsi"),
                  "-o", str(tmp_path / "out.bcf")])
