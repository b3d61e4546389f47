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


def test_ws_mixed_block_read_tolerance(tmp_path):
    """WS_MIXED (=3) is enumerated in the format (gt_block.hpp:70) but the
    reference throws at encode whenever its per-line sparse heuristic
    fires (gt_block.hpp:346-348), so on-disk WS_MIXED blocks are
    WAH-track-only; all decoders must read them with WS_WAH semantics."""
    import struct

    from tests.gt_synth import make_record
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder
    from xsqueezeit_tpu.format.constants import GTDict, WeirdnessStrategy

    rng = np.random.default_rng(21)
    records = [make_record(rng, 40, p_alt=0.3, p_missing=0.05, p_eov=0.02)
               for _ in range(12)]
    enc = GtBlockEncoder(40, block_bcf_lines=100, mac_threshold=2,
                         default_phasing=1, aet_dtype=np.uint16,
                         weirdness_strategy=WeirdnessStrategy.WS_WAH)
    for gt, na in records:
        enc.encode_record(gt, na)
    payload = bytearray(enc.serialize())

    pair = struct.pack("<II", GTDict.KEY_WEIRDNESS_STRATEGY,
                       WeirdnessStrategy.WS_WAH)
    at = payload.find(pair)
    assert 0 <= at < 8 + 16 * 64, "strategy pair must sit in the dictionary"
    payload[at:at + 8] = struct.pack("<II", GTDict.KEY_WEIRDNESS_STRATEGY, 3)

    dec = GtBlockDecoder(bytes(payload), 40, 80, aet_dtype=np.uint16)
    assert dec.weirdness_strat == WeirdnessStrategy.WS_WAH
    pos = 0
    for gt, na in records:
        dec.seek(pos)
        np.testing.assert_array_equal(dec.fill_genotype_array_advance(na), gt)
        pos += na - 1

    # unknown strategy values must be rejected loudly, not misdecoded
    payload[at:at + 8] = struct.pack("<II", GTDict.KEY_WEIRDNESS_STRATEGY, 7)
    with pytest.raises(ValueError, match="weirdness strategy"):
        GtBlockDecoder(bytes(payload), 40, 80, aet_dtype=np.uint16)


def test_ws_mixed_native_accessor(tmp_path):
    """File-level WS_MIXED tolerance through the native C++ accessor."""
    import shutil
    import struct
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from tests import fixtures
    from xsqueezeit_tpu.cli import main as cli_main
    from xsqueezeit_tpu.format.constants import GTDict, WeirdnessStrategy
    from xsqueezeit_tpu.io.unified import GtInput

    vcf = fixtures.ALL_MICRO["micro_missing"](str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi, "--wah-encode-missing"]) == 0
    data = bytearray(open(xsi, "rb").read())
    pair = struct.pack("<II", GTDict.KEY_WEIRDNESS_STRATEGY,
                       WeirdnessStrategy.WS_WAH)
    hits = [i for i in range(len(data) - 7) if data[i:i + 8] == pair]
    assert len(hits) == 1, "ambiguous patch site"
    data[hits[0]:hits[0] + 8] = struct.pack(
        "<II", GTDict.KEY_WEIRDNESS_STRATEGY, 3)
    with open(xsi, "wb") as f:
        f.write(bytes(data))

    from xsqueezeit_tpu.interop.native import NativeAccessor
    native = [(na, gt.tolist()) for na, gt in NativeAccessor(xsi)]
    orig = [(r.n_alleles, r.gt.tolist()) for r in GtInput(vcf)]
    assert native == orig


def test_bitmap_variants(tmp_path):
    """L9 bitmap variants (bitmap.hpp block-/tree-sorted, final-sorted,
    color): permutation and arrangement-consistency oracles."""
    from tests import fixtures
    from xsqueezeit_tpu.utils import bitmap

    vcf = fixtures.random_vcf(str(tmp_path / "bm.vcf"), n_samples=25,
                              n_records=120, seed=77)
    plain = np.stack(list(bitmap._common_rows(vcf)))
    L, H = plain.shape
    assert L > 20

    srt = bitmap.final_sorted_bitmap(vcf)
    assert srt.shape == plain.shape
    # every row is the same multiset of bits
    np.testing.assert_array_equal(srt.sum(axis=1), plain.sum(axis=1))
    # the final arrangement stable-partitions by the LAST line, so the
    # last line renders as [zeros..., ones...] contiguous
    last = srt[-1]
    k = int(last.sum())
    assert not last[:H - k].any() and last[H - k:].all()

    blk = bitmap.block_sorted_bitmap(vcf, block_size=16, pbwt=False)
    np.testing.assert_array_equal(blk.sum(axis=1), plain.sum(axis=1))
    blk_p = bitmap.block_sorted_bitmap(vcf, block_size=16, pbwt=True)
    # pbwt=True uses the block-START arrangement: block-start rows must
    # match a continuously-evolving PBWT view over the same common rows
    a = np.arange(H)
    ev_rows = []
    from xsqueezeit_tpu.ops import pbwt_np
    for bits in plain:
        ev_rows.append(bits[a])
        a = pbwt_np.stable_partition(a, bits[a])
    for start in range(0, L, 16):
        np.testing.assert_array_equal(blk_p[start], ev_rows[start])

    tree = bitmap.tree_sorted_bitmap(vcf)
    np.testing.assert_array_equal(tree.sum(axis=1), plain.sum(axis=1))
    np.testing.assert_array_equal(tree[0], plain[0])  # starts at identity

    color = bitmap.pbwt_color_bitmap(vcf)
    assert color.shape == (L, H)
    np.testing.assert_array_equal(color[0], np.arange(H))
    ident = np.arange(H)
    for row in color[1:4]:
        np.testing.assert_array_equal(np.sort(row), ident)

    # raw dump formats (0xFF/0x00 bytes; u16 ids for color)
    for mode, width in (("plain", 1), ("sorted", 1), ("block", 1),
                        ("tree", 1), ("color", 2)):
        out = tmp_path / f"d_{mode}.bin"
        info = bitmap.dump_common(vcf, str(out), mode=mode, block_size=16)
        assert out.stat().st_size == info["rows"] * info["haps"] * width


def test_native_scan_records_corrupt_var_file(tmp_path):
    """xsi_scan_records walks the (untrusted) variant file natively: a
    corrupt/truncated var.bcf must surface as a clean error, not a crash
    or silent short read of garbage."""
    pytest.importorskip("xsqueezeit_tpu.interop.native")
    from xsqueezeit_tpu.interop.native import NativeAccessor
    from xsqueezeit_tpu.cli import main as cli_main
    from tests import fixtures

    vcf = fixtures.micro_basic(str(tmp_path / "m.vcf"))
    xsi = str(tmp_path / "m.xsi")
    assert cli_main(["-c", "-f", vcf, "-o", xsi]) == 0

    var = xsi + "_var.bcf"
    import gzip

    # rewrite the var file with a record frame word pointing past EOF
    raw = gzip.decompress(open(var, "rb").read())
    blob = bytearray(raw)
    # corrupt the first record's l_shared (immediately after header text)
    l_text = int.from_bytes(raw[5:9], "little")
    frame = 9 + l_text
    blob[frame:frame + 4] = (0x7FFFFFF0).to_bytes(4, "little")
    import xsqueezeit_tpu.io.bgzf as bgzf
    w = bgzf.BgzfWriter(var)
    w.write(bytes(blob))
    w.close()

    acc = NativeAccessor(xsi)
    try:
        with pytest.raises(OSError):
            acc.scan_records()
    finally:
        acc.close()
