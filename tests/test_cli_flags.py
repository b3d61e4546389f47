"""Flag-surface equivalences and round trips the matrix tests don't cover:
-S==-s, -R==-r, -d==-x, -H, --wah-encode-missing, zstd level sweep,
recompress-from-extracted-BCF, -r+-t combined, empty non-x selections.
Reference anchors: xsqueezeit.cpp:64-118 (option surface),
gt_decompressor_new.hpp:480-516."""
import pytest

from xsqueezeit_tpu.cli import main as cli_main
from tests import fixtures


def _body(path):
    return [l for l in open(path) if not l.startswith("#")]


@pytest.fixture(scope="module")
def rich(tmp_path_factory):
    td = tmp_path_factory.mktemp("flags")
    vcf = fixtures.random_vcf(str(td / "in.vcf"), n_samples=20,
                              n_records=80, seed=11)
    xsi = str(td / "in.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0
    return td, vcf, xsi


def test_samples_file_equals_list(rich, tmp_path):
    td, vcf, xsi = rich
    sf = tmp_path / "keep.txt"
    sf.write_text("S003\nS010\nS017\n")
    o1, o2 = str(tmp_path / "sf.vcf"), str(tmp_path / "sl.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", o1, "-S", str(sf), "-O", "v"]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", o2, "-s", "S003,S010,S017",
                     "-O", "v"]) == 0
    assert open(o1).read() == open(o2).read()


def test_regions_file_equals_inline(rich, tmp_path):
    td, vcf, xsi = rich
    rf = tmp_path / "regions.txt"
    rf.write_text("20\t60500\t61500\n")
    o1, o2 = str(tmp_path / "rf.vcf"), str(tmp_path / "ri.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", o1, "-R", str(rf), "-O", "v"]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", o2, "-r", "20:60500-61500",
                     "-O", "v"]) == 0
    assert _body(o1) == _body(o2) and _body(o1)


def test_decompress_alias(rich, tmp_path):
    td, vcf, xsi = rich
    o1, o2 = str(tmp_path / "d.vcf"), str(tmp_path / "x.vcf")
    assert cli_main(["-d", "-f", xsi, "-o", o1, "-O", "v"]) == 0
    assert cli_main(["-x", "-f", xsi, "-o", o2, "-O", "v"]) == 0
    assert open(o1).read() == open(o2).read()


def test_no_header_flag(rich, tmp_path):
    td, vcf, xsi = rich
    out = str(tmp_path / "nohdr.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-H", "-O", "v"]) == 0
    txt = open(out).read()
    assert not txt.startswith("#")
    assert len(txt.splitlines()) == 80


def test_wah_encode_missing_roundtrip(tmp_path):
    vcf = fixtures.micro_missing(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi, "--wah-encode-missing"]) == 0
    out = str(tmp_path / "rt.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-O", "v"]) == 0
    for a, b in zip(_body(vcf), _body(out)):
        assert a.split("\t")[9:] == b.split("\t")[9:]


def test_recompress_from_extracted_bcf(rich, tmp_path):
    """xsi -> -O b -> -c -> -O v equals the direct -O v extraction."""
    td, vcf, xsi = rich
    bcf = str(tmp_path / "rt.bcf")
    assert cli_main(["-x", "-f", xsi, "-o", bcf, "-O", "b"]) == 0
    xsi2 = str(tmp_path / "re.xsi")
    assert cli_main(["-c", "-f", bcf, "-o", xsi2]) == 0
    va, vb = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", va, "-O", "v"]) == 0
    assert cli_main(["-x", "-f", xsi2, "-o", vb, "-O", "v"]) == 0
    assert _body(va) == _body(vb)


@pytest.mark.parametrize("lvl", ["1", "19"])
def test_zstd_level_roundtrip(rich, tmp_path, lvl):
    td, vcf, xsi = rich
    xz = str(tmp_path / f"z{lvl}.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xz, "--zstd", "--zl", lvl]) == 0
    out = str(tmp_path / f"z{lvl}.vcf")
    assert cli_main(["-x", "-f", xz, "-o", out, "-O", "v"]) == 0
    ref = str(tmp_path / "plain.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", ref, "-O", "v"]) == 0
    assert _body(out) == _body(ref)


def test_region_and_targets_combined(rich, tmp_path):
    td, vcf, xsi = rich
    out = str(tmp_path / "rt.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-r", "20", "-t",
                     "20:60000-61000", "-O", "v"]) == 0
    only_t = str(tmp_path / "t.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", only_t, "-t", "20:60000-61000",
                     "-O", "v"]) == 0
    assert _body(out) == _body(only_t)


def test_empty_selection_non_x(rich, tmp_path):
    """Empty region on a non-x output: header-only file, exit 0 (the -O x
    error case is pinned in test_cli_errors.py)."""
    td, vcf, xsi = rich
    out = str(tmp_path / "empty.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", out, "-r", "20:1-2",
                     "-O", "v"]) == 0
    assert _body(out) == []
    assert open(out).read().startswith("##")


def test_plain_gzip_vcf_input(rich, tmp_path):
    """Plain-gzip (non-BGZF) .vcf.gz input compresses like htslib would
    accept it (reference rides hts_open; the from-scratch sniffer peeks
    through gzip, io/unified.py::sniff_format)."""
    import gzip as _gzip
    td, vcf, xsi = rich
    gz = str(tmp_path / "in.vcf.gz")
    with open(vcf, "rb") as f, _gzip.open(gz, "wb") as g:
        g.write(f.read())
    xz = str(tmp_path / "gz.xsi")
    assert cli_main(["-c", "-f", gz, "-o", xz]) == 0
    out = str(tmp_path / "gz.vcf")
    assert cli_main(["-x", "-f", xz, "-o", out, "-O", "v"]) == 0
    ref = str(tmp_path / "ref.vcf")
    assert cli_main(["-x", "-f", xsi, "-o", ref, "-O", "v"]) == 0
    assert _body(out) == _body(ref)
