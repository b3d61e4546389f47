import numpy as np
import pytest

from xsqueezeit_tpu.ops import wah_np
from tests.reference_impls import wah_decode_scalar, wah_encode_scalar


def random_bits(rng, n, p):
    return (rng.random(n) < p).astype(np.uint8)


CASES = [
    (0, 0.5), (1, 0.0), (1, 1.0), (14, 0.5), (15, 0.5), (16, 0.5),
    (29, 0.1), (30, 0.0), (30, 1.0), (100, 0.01), (100, 0.99),
    (5008, 0.001), (5008, 0.5), (5008, 0.999), (123457, 0.0001),
]


@pytest.mark.parametrize("n,p", CASES)
def test_encode_matches_scalar(n, p):
    rng = np.random.default_rng(n * 1000 + int(p * 100))
    bits = random_bits(rng, n, p)
    got = wah_np.wah_encode(bits)
    want = wah_encode_scalar(list(bits))
    assert got.tolist() == want


@pytest.mark.parametrize("n,p", CASES)
def test_roundtrip(n, p):
    rng = np.random.default_rng(n + int(p * 17))
    bits = random_bits(rng, n, p)
    words = wah_np.wah_encode(bits)
    dec, used = wah_np.wah_decode(words, n)
    assert used == len(words)
    np.testing.assert_array_equal(dec, bits)


def test_decode_matches_scalar_on_stream():
    """Concatenated lines in one stream decode line by line."""
    rng = np.random.default_rng(7)
    lines = [random_bits(rng, 5008, p) for p in (0.0, 0.5, 1.0, 0.01, 0.9)]
    stream = np.concatenate([wah_np.wah_encode(b) for b in lines])
    pos = 0
    for b in lines:
        dec, used = wah_np.wah_decode(stream[pos:], 5008)
        want, used_s = wah_decode_scalar(stream[pos:].tolist(), 5008)
        assert used == used_s
        np.testing.assert_array_equal(dec, np.array(want, np.uint8))
        np.testing.assert_array_equal(dec, b)
        pos += used
    assert pos == len(stream)


def test_counter_saturation():
    # > 16383 words of zeros: must split counters at 16383
    n = (16383 + 5) * 15
    bits = np.zeros(n, np.uint8)
    words = wah_np.wah_encode(bits)
    assert words.tolist() == [0x8000 | 16383, 0x8000 | 5]
    dec, used = wah_np.wah_decode(words, n)
    assert used == 2 and not dec.any()

    bits = np.ones(n, np.uint8)
    words = wah_np.wah_encode(bits)
    assert words.tolist() == [0xC000 | 16383, 0xC000 | 5]
    dec, _, ones = wah_np.wah_decode_count_ones(words, n)
    assert dec.all() and ones == n


def test_count_ones():
    rng = np.random.default_rng(3)
    for n, p in [(5008, 0.3), (100, 0.9), (31, 1.0)]:
        bits = random_bits(rng, n, p)
        words = wah_np.wah_encode(bits)
        _, _, ones = wah_np.wah_decode_count_ones(words, n)
        assert ones == int(bits.sum())


def test_mixed_runs_and_literals():
    bits = np.concatenate([
        np.zeros(45, np.uint8), np.ones(30, np.uint8),
        np.array([1, 0] * 10, np.uint8), np.zeros(14, np.uint8), [np.uint8(1)]])
    n = bits.shape[0]
    words = wah_np.wah_encode(bits)
    dec, used = wah_np.wah_decode(words, n)
    np.testing.assert_array_equal(dec, bits)
    assert words.tolist() == wah_encode_scalar(list(bits))


def test_wah_expand_block_matches_per_line_decode():
    """Whole-block expansion == per-line wah_decode over a concatenated
    uniform-width stream (the host block decoder's bit-cache path)."""
    import numpy as np
    from xsqueezeit_tpu.ops import wah_np

    rng = np.random.default_rng(31)
    n, n_lines = 173, 37          # 173 bits -> 12 words/line
    w = (n + 14) // 15
    streams, want = [], []
    for _ in range(n_lines):
        p = rng.choice([0.01, 0.3, 0.9, 0.999])
        bits = (rng.random(n) < p).astype(np.uint8)
        streams.append(wah_np.wah_encode(bits))
        want.append(bits)
    stream = np.concatenate(streams)
    # trailing junk beyond the grid must be ignored
    stream = np.concatenate([stream, rng.integers(0, 2**15, 7).astype(np.uint16)])
    groups = wah_np.wah_expand_block(stream, n_lines, w)
    got = wah_np.unpack_words(groups, w * 15)[:, :n]
    np.testing.assert_array_equal(got, np.stack(want))
