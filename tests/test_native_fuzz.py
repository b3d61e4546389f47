"""Fuzz the native C++ accessor under ASan/UBSan with corrupt containers.

The reference leans on htslib's validation for file parsing; this package's
native accessor (native/xsi_accessor.cpp) parses BGZF/BCF/XSI bytes itself,
so every file-controlled offset must fail cleanly on malformed input.
Mirrors the Python-side tests/test_robustness.py matrix: truncations,
header/dictionary corruption, zero/huge counters, random byte flips and
bad zstd frames — through `xsi_open` / `xsi_next_record` /
`xsi_get_genotypes` in a sanitized process.

Pass criterion: any CLEAN exit code is acceptable (open error, fill error,
short iteration, even a wrong checksum); a sanitizer report (exit 99) or a
raw signal (negative returncode) is a failure.
"""
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from tests import fixtures
from xsqueezeit_tpu.cli import main as cli_main

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")

_ASAN_ENV = {
    **os.environ,
    # exitcode marks sanitizer findings unambiguously; leaks in the
    # error paths count too (detect_leaks on by default).
    "ASAN_OPTIONS": "exitcode=99:abort_on_error=0",
    "UBSAN_OPTIONS": "exitcode=99:print_stacktrace=1",
}


@pytest.fixture(scope="module")
def fuzz_bin():
    subprocess.run(["make", "-C", _NATIVE_DIR, "fuzz_accessor_asan"],
                   check=True, capture_output=True)
    return os.path.join(_NATIVE_DIR, "fuzz_accessor_asan")


@pytest.fixture(scope="module", params=["plain", "zstd"])
def container(request, tmp_path_factory):
    td = tmp_path_factory.mktemp(f"fuzz_{request.param}")
    vcf = fixtures.random_vcf(str(td / "in.vcf"), n_samples=21, n_records=80,
                              seed=29, p_multi=0.2)
    xsi = str(td / "f.xsi")
    args = ["-c", "-f", vcf, "-o", xsi, "--variant-block-length", "32"]
    if request.param == "zstd":
        args.append("--zstd")
    assert cli_main(args) == 0
    return xsi


def _run(fuzz_bin, path: str) -> subprocess.CompletedProcess:
    return subprocess.run([fuzz_bin, path], env=_ASAN_ENV,
                          capture_output=True, text=True, timeout=120)


def _check_clean(r: subprocess.CompletedProcess, what: str) -> None:
    blob = r.stdout + r.stderr
    assert r.returncode >= 0, f"{what}: died on signal {-r.returncode}\n{blob}"
    assert r.returncode != 99, f"{what}: sanitizer report\n{blob}"
    assert "AddressSanitizer" not in blob and "runtime error" not in blob, \
        f"{what}: sanitizer output without exitcode\n{blob}"


def _write_pair(tmp_path, name: str, xsi_bytes: bytes,
                var_bytes: bytes) -> str:
    p = str(tmp_path / f"{name}.xsi")
    with open(p, "wb") as f:
        f.write(xsi_bytes)
    with open(p + "_var.bcf", "wb") as f:
        f.write(var_bytes)
    return p


def test_happy_path_sanitized(fuzz_bin, container):
    """The well-formed container must iterate fully under ASan (baseline:
    instrumentation itself is clean, leaks included)."""
    r = _run(fuzz_bin, container)
    _check_clean(r, "happy path")
    assert r.returncode == 0 and "done records=80" in r.stdout, r.stdout


def test_truncated_xsi(fuzz_bin, container, tmp_path):
    data = open(container, "rb").read()
    var = open(container + "_var.bcf", "rb").read()
    for cut in (0, 7, 100, 255, 256, 300, len(data) // 2, len(data) - 3):
        p = _write_pair(tmp_path, f"t{cut}", data[:cut], var)
        _check_clean(_run(fuzz_bin, p), f"xsi truncated at {cut}")


def test_truncated_var_bcf(fuzz_bin, container, tmp_path):
    data = open(container, "rb").read()
    var = open(container + "_var.bcf", "rb").read()
    for cut in (0, 10, 64, len(var) // 3, len(var) - 5):
        p = _write_pair(tmp_path, f"v{cut}", data, var[:cut])
        _check_clean(_run(fuzz_bin, p), f"var.bcf truncated at {cut}")


def test_corrupt_header_fields(fuzz_bin, container, tmp_path):
    """Huge/zero values in every 32-bit word of the 256-byte header —
    counters, offsets, sample counts — must not overread."""
    data = bytearray(open(container, "rb").read())
    var = open(container + "_var.bcf", "rb").read()
    for off in range(8, 256, 4):
        for val in (0, 0xFFFFFFFF, 0x7FFFFFFF, len(data) * 2):
            mut = bytearray(data)
            struct.pack_into("<I", mut, off, val & 0xFFFFFFFF)
            p = _write_pair(tmp_path, f"h{off}_{val & 0xFFFF}", bytes(mut),
                            var)
            _check_clean(_run(fuzz_bin, p),
                         f"header word {off} set to {val:#x}")


def test_random_flips_xsi(fuzz_bin, container, tmp_path):
    rng = np.random.default_rng(31)
    data = bytearray(open(container, "rb").read())
    var = open(container + "_var.bcf", "rb").read()
    for trial in range(60):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mut)))
            mut[pos] ^= int(rng.integers(1, 256))
        p = _write_pair(tmp_path, f"r{trial}", bytes(mut), var)
        _check_clean(_run(fuzz_bin, p), f"random flip trial {trial}")


def test_random_flips_var_bcf(fuzz_bin, container, tmp_path):
    rng = np.random.default_rng(37)
    data = open(container, "rb").read()
    var = bytearray(open(container + "_var.bcf", "rb").read())
    for trial in range(40):
        mut = bytearray(var)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mut)))
            mut[pos] ^= int(rng.integers(1, 256))
        p = _write_pair(tmp_path, f"b{trial}", data, bytes(mut))
        _check_clean(_run(fuzz_bin, p), f"var.bcf flip trial {trial}")


def test_block_payload_garbage(fuzz_bin, container, tmp_path):
    """Replace whole stretches after the header with garbage (kills zstd
    frames in the zstd flavor, dictionary/stream bytes in both)."""
    rng = np.random.default_rng(41)
    data = bytearray(open(container, "rb").read())
    var = open(container + "_var.bcf", "rb").read()
    for trial in range(12):
        mut = bytearray(data)
        if len(mut) <= 300:
            break
        start = int(rng.integers(256, len(mut) - 32))
        span = int(rng.integers(8, min(256, len(mut) - start)))
        mut[start:start + span] = bytes(rng.integers(
            0, 256, span, dtype=np.uint8))
        p = _write_pair(tmp_path, f"g{trial}", bytes(mut), var)
        _check_clean(_run(fuzz_bin, p), f"garbage stretch trial {trial}")


def test_swapped_companions(fuzz_bin, container, tmp_path):
    """var.bcf bytes in the .xsi slot and vice versa (wrong-file errors)."""
    data = open(container, "rb").read()
    var = open(container + "_var.bcf", "rb").read()
    p = _write_pair(tmp_path, "swap", var, data)
    _check_clean(_run(fuzz_bin, p), "swapped companion files")


# ---------------------------------------------------------------- gt_batch
@pytest.fixture(scope="module")
def gtb_fuzz_bin():
    subprocess.run(["make", "-C", _NATIVE_DIR, "fuzz_gtb_asan"],
                   check=True, capture_output=True)
    return os.path.join(_NATIVE_DIR, "fuzz_gtb_asan")


@pytest.fixture(scope="module")
def gtb_bcf(tmp_path_factory):
    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.io.bcf import BcfReader

    td = tmp_path_factory.mktemp("gtb")
    p = str(td / "in.bcf")
    synth_bcf(p, 90, 31)
    r = BcfReader(p)
    skip = 9 + r.header_text_len
    gt_key = r.header.str2idx["GT"]
    r.close()
    return p, skip, gt_key, 31


def _run_gtb(binpath, path, skip, gt_key, n_samples):
    return subprocess.run(
        [binpath, path, str(skip), str(gt_key), str(n_samples)],
        env=_ASAN_ENV, capture_output=True, text=True, timeout=120)


def test_gtb_happy_path_sanitized(gtb_fuzz_bin, gtb_bcf):
    p, skip, key, n = gtb_bcf
    r = _run_gtb(gtb_fuzz_bin, p, skip, key, n)
    _check_clean(r, "gtb happy path")
    assert "records 90" in r.stdout


def test_gtb_truncations(gtb_fuzz_bin, gtb_bcf, tmp_path):
    p, skip, key, n = gtb_bcf
    data = open(p, "rb").read()
    for frac in (0.1, 0.5, 0.9, 0.99):
        cut = str(tmp_path / f"cut{int(frac*100)}.bcf")
        open(cut, "wb").write(data[: int(len(data) * frac)])
        r = _run_gtb(gtb_fuzz_bin, cut, skip, key, n)
        _check_clean(r, f"gtb truncated {frac}")


def test_gtb_bit_flips(gtb_fuzz_bin, gtb_bcf, tmp_path):
    import numpy as np

    p, skip, key, n = gtb_bcf
    data = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(17)
    for trial in range(12):
        mut = bytearray(data)
        for pos in rng.integers(0, len(mut), 24):
            mut[pos] ^= 1 << int(rng.integers(0, 8))
        f = str(tmp_path / f"flip{trial}.bcf")
        open(f, "wb").write(bytes(mut))
        r = _run_gtb(gtb_fuzz_bin, f, skip, key, n)
        _check_clean(r, f"gtb flips trial {trial}")


def test_gtb_wrong_geometry(gtb_fuzz_bin, gtb_bcf):
    """Mismatched skip/key/sample-count must fail cleanly, not overread."""
    p, skip, key, n = gtb_bcf
    for args in ((p, 0, key, n), (p, skip + 13, key, n),
                 (p, skip, key + 5, n), (p, skip, key, n * 3),
                 (p, skip, key, 1)):
        r = _run_gtb(gtb_fuzz_bin, *args)
        _check_clean(r, f"gtb geometry {args[1:]}")


# -------------------------------------------------------- encoder/var pass
@pytest.fixture(scope="module")
def enc_fuzz_bin():
    subprocess.run(["make", "-C", _NATIVE_DIR, "fuzz_enc_asan"],
                   check=True, capture_output=True)
    return os.path.join(_NATIVE_DIR, "fuzz_enc_asan")


def test_enc_adversarial_values_sanitized(enc_fuzz_bin):
    """Random gt arrays with sentinel/huge/corrupt values through every
    weirdness strategy of the native block encoder."""
    for seed in (1, 2, 3, 4):
        r = subprocess.run(
            [enc_fuzz_bin, "enc", str(seed), str(17 + seed * 13), "300"],
            env=_ASAN_ENV, capture_output=True, text=True, timeout=120)
        _check_clean(r, f"enc seed {seed}")


def test_var_pass_corrupt_inputs_sanitized(enc_fuzz_bin, gtb_bcf, tmp_path):
    """xsi_var_pass over intact, truncated and bit-flipped BCFs, and with
    wrong skip/gt_key geometry."""
    import numpy as np

    p, skip, key, _n = gtb_bcf
    data = bytearray(open(p, "rb").read())

    def run(path, s, k):
        return subprocess.run(
            [enc_fuzz_bin, "var", path, str(s), str(k)],
            env=_ASAN_ENV, capture_output=True, text=True, timeout=120)

    _check_clean(run(p, skip, key), "var intact")
    _check_clean(run(p, 0, key), "var bad skip")
    _check_clean(run(p, skip + 7, key + 3), "var off geometry")
    for frac in (0.3, 0.95):
        cut = str(tmp_path / f"vcut{int(frac*100)}.bcf")
        open(cut, "wb").write(bytes(data[: int(len(data) * frac)]))
        _check_clean(run(cut, skip, key), f"var truncated {frac}")
    rng = np.random.default_rng(5)
    for trial in range(6):
        mut = bytearray(data)
        for posn in rng.integers(0, len(mut), 16):
            mut[posn] ^= 1 << int(rng.integers(0, 8))
        f = str(tmp_path / f"vflip{trial}.bcf")
        open(f, "wb").write(bytes(mut))
        _check_clean(run(f, skip, key), f"var flip {trial}")


def test_tsan_threaded_emitter_extract(tmp_path):
    """ThreadSanitizer smoke over the bcf_emit deflate worker pool: a
    threaded extract must finish race-free and byte-identical to the
    synchronous writer."""
    import numpy as np

    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.codec.compressor import (
        CompressorOptions,
        compress_file,
    )
    from xsqueezeit_tpu.codec.decompressor import (
        Decompressor,
        DecompressorOptions,
    )

    inp = str(tmp_path / "in.bcf")
    synth_bcf(inp, 1200, 101)
    xsi = str(tmp_path / "o.xsi")
    compress_file(inp, xsi, CompressorOptions(block_length=256,
                                              device="numpy"))

    d = Decompressor(xsi, DecompressorOptions(output_type="b"))
    header = d.output_header()
    text = header.to_text().encode() + b"\0"
    gt_key = header.str2idx["GT"]
    hpath = str(tmp_path / "hdr.bin")
    with open(hpath, "wb") as f:
        f.write(text)

    subprocess.run(["make", "-C", _NATIVE_DIR, "tsan_extract"],
                   check=True, capture_output=True)
    tsan_bin = os.path.join(_NATIVE_DIR, "tsan_extract")
    out3 = str(tmp_path / "t3.bcf")
    env = dict(os.environ,
               TSAN_OPTIONS="halt_on_error=1 exitcode=66")
    r = subprocess.run([tsan_bin, xsi, out3, hpath, str(gt_key), "3"],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"tsan extract failed:\n{r.stderr[-3000:]}"
    assert "WARNING: ThreadSanitizer" not in r.stderr, r.stderr[-3000:]

    out0 = str(tmp_path / "t0.bcf")
    r0 = subprocess.run([tsan_bin, xsi, out0, hpath, str(gt_key), "0"],
                        env=env, capture_output=True, text=True, timeout=300)
    assert r0.returncode == 0, r0.stderr[-3000:]
    with open(out0, "rb") as a, open(out3, "rb") as b:
        assert a.read() == b.read(), "threaded output differs from sync"
