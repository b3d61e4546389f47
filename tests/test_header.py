import pytest

from xsqueezeit_tpu.format.constants import HEADER_SIZE
from xsqueezeit_tpu.format.header import XsiHeader


def test_header_size():
    h = XsiHeader()
    assert len(h.pack()) == HEADER_SIZE


def test_header_roundtrip():
    h = XsiHeader(
        version=5, ploidy=2, ind_bytes=4, aet_bytes=2, wah_bytes=2,
        has_missing=True, non_uniform_phasing=False, default_phased=True,
        iota_ppa=True, no_sort=False, zstd=True,
        hap_samples=5008, num_variants=12345678, ss_rate=8192,
        number_of_ssas=3, wahs_offset=256, indices_offset=100000,
        samples_offset=100100, rare_threshold=5, xcf_entries=9999999,
        num_samples=2504,
    )
    h2 = XsiHeader.unpack(h.pack())
    assert h == h2


def test_header_field_offsets():
    """Spot check the binary layout against the reference struct."""
    h = XsiHeader(version=5, aet_bytes=2, hap_samples=0x1122334455667788,
                  ss_rate=0xAABB, samples_offset=0xDEADBEEF,
                  num_samples=0xCAFE)
    b = h.pack()
    assert b[0:4] == bytes.fromhex("ddccbbaa")     # endianness LE
    assert b[4:8] == bytes.fromhex("6717edfe")     # magic LE
    assert b[8:12] == (5).to_bytes(4, "little")
    assert b[12] == 2          # ploidy
    assert b[14] == 2          # aet_bytes
    assert b[15] == 2          # wah_bytes
    assert b[32:40] == (0x1122334455667788).to_bytes(8, "little")
    assert b[56:60] == (0xAABB).to_bytes(4, "little")
    assert b[80:88] == (0xDEADBEEF).to_bytes(8, "little")
    assert b[112:120] == (0xCAFE).to_bytes(8, "little")
    assert b[252:256] == bytes.fromhex("6717edfe")


def test_bad_magic():
    h = XsiHeader().pack()
    with pytest.raises(ValueError):
        XsiHeader.unpack(b"\0" * 4 + h[4:])
