"""File-level robustness: bad magics, truncation, fuzzed headers/blocks.

The reference validates magic/endianness/version on open (accessor.cpp:37-51)
and otherwise trusts the container; the rebuild must never crash with
anything worse than a clean exception on corrupt input.
"""
import numpy as np
import pytest

from tests import fixtures
from xsqueezeit_tpu.accessor import Accessor
from xsqueezeit_tpu.codec.compressor import CompressorOptions, compress_file
from xsqueezeit_tpu.codec.decompressor import Decompressor, DecompressorOptions
from xsqueezeit_tpu.format.header import XsiHeader


@pytest.fixture(scope="module")
def xsi(tmp_path_factory):
    d = tmp_path_factory.mktemp("robust")
    vcf = fixtures.random_vcf(str(d / "in.vcf"), n_samples=13, n_records=50,
                              seed=13)
    path = str(d / "f.xsi")
    compress_file(vcf, path, CompressorOptions(block_length=16))
    return path


def test_bad_magic_rejected(xsi, tmp_path):
    data = bytearray(open(xsi, "rb").read())
    data[4] ^= 0xFF  # first magic
    bad = tmp_path / "bad.xsi"
    bad.write_bytes(bytes(data))
    with pytest.raises(Exception, match="[Mm]agic|endian"):
        XsiHeader.unpack(bytes(data[:256]))


def test_bad_version_rejected(xsi, tmp_path):
    data = bytearray(open(xsi, "rb").read())
    hdr = XsiHeader.unpack(bytes(data[:256]))
    assert hdr.version == 5
    data[8] = 99  # version byte
    bad = tmp_path / "v99.xsi"
    bad.write_bytes(bytes(data))
    with pytest.raises(Exception, match="[Vv]ersion"):
        Accessor(str(bad))


def test_truncated_file_clean_error(xsi, tmp_path):
    data = open(xsi, "rb").read()
    for cut in (100, 300, len(data) // 2):
        t = tmp_path / f"trunc{cut}.xsi"
        t.write_bytes(data[:cut])
        with pytest.raises(Exception):
            acc = Accessor(str(t))
            for b in range(acc.xsi.n_blocks):
                acc.xsi.gt_block_payload(b)


def test_fuzzed_block_bytes_no_crash(xsi, tmp_path):
    """Flipping bytes inside block payloads must raise or mis-decode, never
    hang or segfault; header/index corruption must raise cleanly."""
    rng = np.random.default_rng(0)
    base = bytearray(open(xsi, "rb").read())
    var = open(xsi + "_var.bcf", "rb").read()
    for trial in range(12):
        data = bytearray(base)
        pos = int(rng.integers(256, len(data)))
        data[pos] ^= int(rng.integers(1, 256))
        f = tmp_path / "fuzz.xsi"
        f.write_bytes(bytes(data))
        with open(str(f) + "_var.bcf", "wb") as vf:
            vf.write(var)
        try:
            out = tmp_path / "fuzz.vcf"
            Decompressor(str(f), DecompressorOptions(output_type="v")) \
                .decompress(str(out))
        except Exception:
            pass  # clean failure is acceptable


def test_missing_variant_file(xsi, tmp_path):
    data = open(xsi, "rb").read()
    lone = tmp_path / "lone.xsi"
    lone.write_bytes(data)
    with pytest.raises(Exception):
        Decompressor(str(lone)).decompress(str(tmp_path / "out.vcf"))


def test_bitmap_utils(tmp_path):
    from xsqueezeit_tpu.utils import bitmap
    vcf = fixtures.random_vcf(str(tmp_path / "b.vcf"), n_samples=9,
                              n_records=40, seed=14)
    plain = bitmap.gt_bitmap(vcf)
    assert plain.shape == (40, 18)
    srt = bitmap.pbwt_sorted_bitmap(vcf, reset_every=16)
    assert srt.shape == plain.shape
    # every row is a permutation of the original row
    assert (srt.sum(axis=1) == plain.sum(axis=1)).all()
    img = tmp_path / "x.pbm"
    bitmap.save_pbm(str(img), srt)
    head = open(img, "rb").read(20)
    assert head.startswith(b"P4\n18 40\n")


def test_v4_container_read(tmp_path, xsi):
    """The reader accepts version-4 containers (u32 index entries), the
    other on-disk layout the reference Accessor supports (v5 differs only
    in 64-bit index/zstd-size fields, accessor_internals_new.hpp:845-869)."""
    import struct
    from xsqueezeit_tpu.codec.decompressor import Decompressor, \
        DecompressorOptions

    data = bytearray(open(xsi, "rb").read())
    hdr = XsiHeader.unpack(bytes(data[:256]))
    assert not hdr.zstd
    nb = hdr.number_of_ssas
    idx64 = np.frombuffer(bytes(
        data[hdr.indices_offset:hdr.indices_offset + nb * 8]), np.uint64)
    idx32 = idx64.astype(np.uint32).tobytes()
    samples = bytes(data[hdr.samples_offset:])
    out = bytearray(data[:hdr.indices_offset]) + idx32 + samples
    struct.pack_into("<I", out, 8, 4)                       # version = 4
    struct.pack_into("<Q", out, 80, hdr.samples_offset - nb * 4)
    v4 = tmp_path / "v4.xsi"
    v4.write_bytes(bytes(out))
    import shutil
    shutil.copy(xsi + "_var.bcf", str(v4) + "_var.bcf")

    outv = tmp_path / "v4.vcf"
    Decompressor(str(v4), DecompressorOptions(output_type="v")) \
        .decompress(str(outv))
    outv5 = tmp_path / "v5.vcf"
    Decompressor(xsi, DecompressorOptions(output_type="v")) \
        .decompress(str(outv5))
    a = [l for l in open(outv) if not l.startswith("#")]
    b = [l for l in open(outv5) if not l.startswith("#")]
    assert a == b and len(a) == 50
