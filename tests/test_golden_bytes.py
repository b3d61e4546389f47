"""Byte-level golden fixtures, hand-derived from reference format semantics.

These bytes are constructed IN THE TEST, field by field, from the reference's
format definitions — NOT from this repo's writers — so any drift in the
on-disk format between rounds fails loudly:

  * WAH2 wire format:        /root/reference/include/wah.hpp:75-105
      16-bit words; MSB=0 -> literal, 15 payload bits LSB-first;
      MSB=1 -> counter, bit14 = fill value, bits 0-13 = count of 15-bit
      groups.
  * Sparse line format:      /root/reference/include/block.hpp:54-99
      [count:A_T][indices:A_T...], MSB of count = negated flag.
  * GT block dictionary:     /root/reference/include/gt_block.hpp:34-72
      [0xFFFFFFFF][n][key u32,val u32]*n, offsets relative to block start.
  * PBWT stable partition:   /root/reference/include/gt_block.hpp:106-151
      zeros keep order in front, ones appended; arrangement starts iota.
  * Top-level block framing: /root/reference/include/interfaces.hpp:37-97,161-168
  * Container layout:        /root/reference/include/xsi_factory.hpp:435-639
  * 256-byte header struct:  /root/reference/include/compression.hpp:40-104
"""
import struct

import numpy as np

# ---------------------------------------------------------------------------
# helpers that restate the wire formats independently (scalar, explicit)
# ---------------------------------------------------------------------------


def wah_literal(bits):
    """bits (<=15, LSB-first) -> one literal WAH word."""
    assert len(bits) <= 15
    w = 0
    for i, b in enumerate(bits):
        w |= int(b) << i
    assert not (w & 0x8000)
    return struct.pack("<H", w)


def sparse_u16(indices, negated=False):
    head = len(indices) | (0x8000 if negated else 0)
    return struct.pack("<H", head) + b"".join(
        struct.pack("<H", i) for i in indices)


def dictionary(entries):
    """entries: list of (key, value) -- written sorted by key, after the
    size symbol pair (interfaces.hpp:37-97; this repo sorts keys for
    determinism where the reference uses hash-map order, a reader-visible
    no-op since readers load the dictionary into a map)."""
    out = struct.pack("<II", 0xFFFFFFFF, len(entries))
    for k, v in sorted(entries):
        out += struct.pack("<II", k, v)
    return out


# GT block dictionary keys (gt_block.hpp:34-72)
KEY_BCF_LINES = 0x0
KEY_BINARY_LINES = 0x1
KEY_MAX_LINE_PLOIDY = 0x2
KEY_DEFAULT_PHASING = 0x3
KEY_WEIRDNESS_STRATEGY = 0x4
KEY_LINE_SORT = 0x10
KEY_LINE_SELECT = 0x11
KEY_LINE_MISSING = 0x16
KEY_MATRIX_WAH = 0x20
KEY_MATRIX_SPARSE = 0x21
KEY_MATRIX_MISSING_SPARSE = 0x36
WS_SPARSE = 2

# ---------------------------------------------------------------------------
# Golden A: 4 samples / 8 haps, 3 biallelic records, phased, threshold 1
#
#   rec1 alleles (natural hap order): 0 1 1 0 0 1 1 0   MAC 4 > 1 -> WAH+sort
#   rec2 alleles:                     0 0 0 0 0 1 0 0   MAC 1 <= 1 -> sparse
#   rec3 alleles:                     0 0 0 1 1 0 0 0   MAC 2 > 1 -> WAH+sort
#
# Derivation:
#   line1 bits in arrangement order (iota) = natural = 01100110 (LSB first)
#     -> literal word 0b0000000001100110 = 0x0066
#   PBWT partition by line1: zeros {0,3,4,7} then ones {1,2,5,6}
#     -> a = [0,3,4,7,1,2,5,6]
#   line2 sparse (does not sort): carriers of ALT, natural order = [5]
#   line3 bits through a: allele[a[j]] for j=0..7 = 0 1 1 0 0 0 0 0
#     -> literal word 0b0000000000000110 = 0x0006
#   LINE_SORT bool vector [1,0,1] -> literal word 0b101 = 0x0005
# ---------------------------------------------------------------------------


def golden_a_payload():
    line_sort = wah_literal([1, 0, 1])                    # 2 bytes @ 80
    matrix_wah = struct.pack("<HH", 0x0066, 0x0006)       # 4 bytes @ 82
    matrix_sparse = sparse_u16([5])                       # 4 bytes @ 86
    d = dictionary([
        (KEY_BCF_LINES, 3),
        (KEY_BINARY_LINES, 3),
        (KEY_MAX_LINE_PLOIDY, 2),
        (KEY_DEFAULT_PHASING, 1),
        (KEY_WEIRDNESS_STRATEGY, WS_SPARSE),
        (KEY_LINE_SORT, 80),
        (KEY_LINE_SELECT, 80),     # shared with sort (gt_block.hpp:520-528)
        (KEY_MATRIX_WAH, 82),
        (KEY_MATRIX_SPARSE, 86),
    ])
    assert len(d) == 80
    return d + line_sort + matrix_wah + matrix_sparse


GOLDEN_A_ALLELES = np.array([
    [0, 1, 1, 0, 0, 1, 1, 0],
    [0, 0, 0, 0, 0, 1, 0, 0],
    [0, 0, 0, 1, 1, 0, 0, 0],
])
# htslib codes, default phasing 1: second hap of each sample gets |1
GOLDEN_A_GT = ((GOLDEN_A_ALLELES + 1) << 1) | (np.arange(8) & 1)


def golden_a_container():
    """Whole .xsi file bytes (v5, no zstd) for golden A."""
    payload = golden_a_payload()
    # top-level block: dictionary {KEY_GT_ENTRY=256: offset} then payload
    top = dictionary([(256, 16)]) + payload               # 16 + 90 = 106
    # layout: header | block | pad4 | pad8 | index u64 | samples
    block_off = 256
    end_blocks = block_off + len(top)                     # 362
    pad4 = (-end_blocks) % 4                              # 2
    pad8 = (-(end_blocks + pad4)) % 8                     # 4
    indices_off = end_blocks + pad4 + pad8                # 368
    samples_off = indices_off + 8                         # 376
    samples = b"S0\0S1\0S2\0S3\0"

    # 256-byte header, field for field (compression.hpp:40-104)
    header = struct.pack(
        "<III"      # endianness, magic, version
        "BBBB"      # ploidy, ind_bytes, aet_bytes, wah_bytes
        "BB2s"      # special bitset, specific bitset, rsvd
        "3I"        # rsvd
        "QQ"        # hap_samples, num_variants
        "II"        # block_size (deprecated), number_of_blocks (deprecated)
        "II"        # ss_rate, number_of_ssas
        "QQQ"       # wahs_offset, indices_offset, samples_offset
        "II"        # rearrangement_track_offset, sparse_offset (unused: ~0)
        "I"         # rare_threshold
        "Q"         # xcf_entries
        "I"         # phase_info_offset
        "Q"         # num_samples
        "104s3I"    # rsvd
        "IIII"      # checksums (unused, 0)
        "I",        # last magic
        0xAABBCCDD, 0xFEED1767, 5,
        2, 4, 2, 2,                       # diploid, u32 ind, u16 A_T, u16 WAH
        0b100, 0b001, b"\0\0",            # default_phased; iota_ppa
        0, 0, 0,
        8, 3,                             # hap_samples, num_variants
        0, 1,
        8192, 1,                          # ss_rate (block length), n blocks
        block_off, indices_off, samples_off,
        0xFFFFFFFF, 0xFFFFFFFF,
        1,                                # rare_threshold = MAC threshold
        3,                                # xcf_entries
        0,
        4,                                # num_samples
        b"\0" * 104, 0, 0, 0,
        0, 0, 0, 0,
        0xFEED1767)
    assert len(header) == 256
    return (header + top + b"\0" * pad4 + b"\0" * pad8
            + struct.pack("<Q", block_off) + samples)


# ---------------------------------------------------------------------------
# Golden B: missing-data exception track (WS_SPARSE), 4 samples, unphased
#
#   rec1 alleles: 0 1 . 0 1 0 0 1   (hap 2 missing)  AC 3 -> WAH+sort
#   rec2 alleles: 0 0 1 0 0 0 0 0   AC 1 -> sparse
#
#   line1 bits (missing counts as 0): 01001001 -> 0x0092
#   missing track, sparse strategy: [1][2]
#   LINE_SORT [1,0] -> 0x0001 ; LINE_MISSING [1,0] -> 0x0001
# ---------------------------------------------------------------------------


def golden_b_payload():
    d = dictionary([
        (KEY_BCF_LINES, 2),
        (KEY_BINARY_LINES, 2),
        (KEY_MAX_LINE_PLOIDY, 2),
        (KEY_DEFAULT_PHASING, 0),
        (KEY_WEIRDNESS_STRATEGY, WS_SPARSE),
        (KEY_LINE_SORT, 96),
        (KEY_LINE_SELECT, 96),
        (KEY_LINE_MISSING, 104),
        (KEY_MATRIX_WAH, 98),
        (KEY_MATRIX_SPARSE, 100),
        (KEY_MATRIX_MISSING_SPARSE, 106),
    ])
    assert len(d) == 96
    return (d
            + wah_literal([1, 0])              # LINE_SORT      @ 96
            + struct.pack("<H", 0x0092)        # MATRIX_WAH     @ 98
            + sparse_u16([2])                  # MATRIX_SPARSE  @ 100
            + wah_literal([1, 0])              # LINE_MISSING   @ 104
            + sparse_u16([2]))                 # MISSING_SPARSE @ 106


GOLDEN_B_GT = np.array([
    [2, 4, 0, 2, 4, 2, 2, 4],    # 0 = unphased missing
    [2, 2, 4, 2, 2, 2, 2, 2],
])


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_encoder_produces_golden_a_payload():
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    enc = GtBlockEncoder(n_samples=4, block_bcf_lines=8192, mac_threshold=1,
                         default_phasing=1, aet_dtype=np.uint16,
                         weirdness_strategy=WS_SPARSE)
    for row in GOLDEN_A_GT:
        enc.encode_record(row.astype(np.int32), 2)
    assert enc.serialize() == golden_a_payload()


def test_decoder_reads_golden_a_payload():
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder

    dec = GtBlockDecoder(golden_a_payload(), 4, 8, np.uint16)
    for want in GOLDEN_A_GT:
        got = dec.fill_genotype_array_advance(2)
        np.testing.assert_array_equal(got, want)


def test_device_decoder_reads_golden_a_payload():
    from xsqueezeit_tpu.codec.decoder_jax import decode_block_records

    got = decode_block_records(golden_a_payload(), 4, 8, np.uint16, [2, 2, 2])
    np.testing.assert_array_equal(np.stack(got), GOLDEN_A_GT)


def test_compressor_produces_golden_a_container(tmp_path):
    from xsqueezeit_tpu.codec.compressor import CompressorOptions, compress_file

    vcf = tmp_path / "a.vcf"
    rows = []
    for rec in GOLDEN_A_ALLELES:
        pairs = [f"{rec[2*i]}|{rec[2*i+1]}" for i in range(4)]
        rows.append(pairs)
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20,length=63025520>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                "S0\tS1\tS2\tS3\n")
        for i, pairs in enumerate(rows):
            f.write(f"20\t{100+i}\t.\tG\tA\t.\tPASS\t.\tGT\t"
                    + "\t".join(pairs) + "\n")
    out = str(tmp_path / "a.xsi")
    compress_file(str(vcf), out, CompressorOptions(maf=0.2, device="numpy"))
    data = open(out, "rb").read()
    assert data == golden_a_container()


def test_accessor_reads_golden_a_container(tmp_path):
    from xsqueezeit_tpu.format.container import XsiReader
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder

    p = tmp_path / "golden_a.xsi"
    p.write_bytes(golden_a_container())
    rd = XsiReader(str(p))
    assert rd.samples == ["S0", "S1", "S2", "S3"]
    assert rd.n_haps == 8
    assert rd.header.rare_threshold == 1
    dec = GtBlockDecoder(rd.gt_block_payload(0), 4, 8, rd.aet_dtype)
    for want in GOLDEN_A_GT:
        np.testing.assert_array_equal(dec.fill_genotype_array_advance(2), want)


def test_encoder_produces_golden_b_payload():
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    enc = GtBlockEncoder(n_samples=4, block_bcf_lines=8192, mac_threshold=1,
                         default_phasing=0, aet_dtype=np.uint16,
                         weirdness_strategy=WS_SPARSE)
    for row in GOLDEN_B_GT:
        enc.encode_record(row.astype(np.int32), 2)
    assert enc.serialize() == golden_b_payload()


def test_decoder_reads_golden_b_payload():
    from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder

    dec = GtBlockDecoder(golden_b_payload(), 4, 8, np.uint16)
    for want in GOLDEN_B_GT:
        np.testing.assert_array_equal(dec.fill_genotype_array_advance(2), want)


# ---------------------------------------------------------------------------
# Size model: the payload's section byte counts follow exactly from the
# format definition (wah.hpp:75-105 / block.hpp:89-98) and the input -- any
# encoder change that grows the format fails here (VERDICT round-1 item 10).
# ---------------------------------------------------------------------------


def test_payload_size_model_random_block():
    from tests.reference_impls import pbwt_step_scalar, wah_encode_scalar
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    rng = np.random.default_rng(11)
    n_samples, H, L = 25, 50, 120
    threshold = 3
    freqs = rng.uniform(0, 1, L)
    alleles = (rng.random((L, H)) < freqs[:, None]).astype(np.int64)

    enc = GtBlockEncoder(n_samples=n_samples, block_bcf_lines=8192,
                         mac_threshold=threshold, default_phasing=0,
                         aet_dtype=np.uint16, weirdness_strategy=WS_SPARSE)
    for row in alleles:
        enc.encode_record(((row + 1) << 1).astype(np.int32), 2)
    payload = enc.serialize()

    # independent size model from the format definition
    a = list(range(H))
    wah_words = 0
    sparse_elems = 0
    is_wah_bits = []
    for row in alleles:
        ac = int(row.sum())
        mac = min(ac, H - ac)
        if mac > threshold:
            is_wah_bits.append(1)
            y = [int(row[a[j]]) for j in range(H)]
            wah_words += len(wah_encode_scalar(y))
            a = pbwt_step_scalar(a, y)
        else:
            is_wah_bits.append(0)
            negated = ac != mac
            count = (H - ac) if negated else ac
            sparse_elems += 1 + count  # head + indices (block.hpp:89-98)
    expected = (
        8 + 9 * 8                                   # dictionary, 9 keys
        + 2 * len(wah_encode_scalar(is_wah_bits))   # LINE_SORT vector
        + 2 * wah_words                             # MATRIX_WAH (u16 words)
        + 2 * sparse_elems                          # MATRIX_SPARSE (u16 A_T)
    )
    assert len(payload) == expected
