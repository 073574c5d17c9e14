"""Baseline JPEG codec (functions/jpeg.py) — pure numpy, no Spark.

No independent JPEG decoder exists in this container (no PIL/ffmpeg),
so correctness rests on: exact round-trip bounds (quantization is the
only loss), structural checks of the emitted JFIF stream, and
malformed-input rejection. The encoder emits its own optimized DHT
tables, so the decoder's generic DHT path is exercised by every
round trip.
"""

import struct

import numpy as np
import pytest

from idzebra_spark.functions.jpeg import (
    ZIGZAG, _assign_codes, _build_table, decode_jpeg, encode_jpeg)


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3 + 20) % 256, (xx * 5 + 80) % 256,
                     ((xx + yy) * 2 + 40) % 256], -1).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: start of the scan and the two diagonals
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_roundtrip_smooth_images_tight():
    for h, w in [(8, 8), (16, 24), (13, 17), (1, 1), (9, 31)]:
        img = _smooth(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 3.0, (h, w, err)


def test_roundtrip_noise_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 12.0  # worst-case content, still quantization-bounded


def test_flat_image_exact():
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(out.astype(int) - 128).max() <= 2


def test_quality_monotone():
    img = _smooth(32, 32)
    lo = decode_jpeg(encode_jpeg(img, quality=20))
    hi = decode_jpeg(encode_jpeg(img, quality=95))
    e_lo = np.abs(lo.astype(int) - img.astype(int)).mean()
    e_hi = np.abs(hi.astype(int) - img.astype(int)).mean()
    assert e_hi <= e_lo
    assert len(encode_jpeg(img, 20)) <= len(encode_jpeg(img, 95))


def test_stream_structure():
    buf = encode_jpeg(_smooth(10, 10))
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # walk the marker segments up to SOS; require DQT x2, DHT x4, SOF0
    i, seen = 2, []
    while True:
        assert buf[i] == 0xFF
        m = buf[i + 1]
        seen.append(m)
        ln = struct.unpack(">H", buf[i + 2:i + 4])[0]
        i += 2 + ln
        if m == 0xDA:
            break
    assert seen.count(0xDB) == 2 and seen.count(0xC4) == 4
    assert 0xC0 in seen and 0xE0 in seen
    # no unstuffed 0xFF inside entropy data (every 0xFF is 00-stuffed
    # or the EOI marker)
    body = buf[i:-2]
    j = 0
    while j < len(body):
        if body[j] == 0xFF:
            assert body[j + 1] == 0x00
            j += 2
        else:
            j += 1


def test_huffman_tables_canonical():
    rng = np.random.default_rng(3)
    freq = np.zeros(256, dtype=np.int64)
    freq[rng.integers(0, 256, 40)] = rng.integers(1, 10_000, 40)
    bits, vals = _build_table(freq)
    assert sum(bits) == len(vals) == len(set(vals))
    assert max(bits[i] and i + 1 for i in range(16)) <= 16
    codes = _assign_codes(bits, vals)
    # prefix-free: no code is a prefix of another
    as_str = {format(c, f"0{ln}b") for c, ln in codes.values()}
    lst = sorted(as_str)
    for a, b in zip(lst, lst[1:]):
        assert not b.startswith(a)
    # the all-ones max-length code is reserved (never assigned)
    maxlen = max(ln for _, ln in codes.values())
    assert "1" * maxlen not in as_str


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all....")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8))  # not 3-channel
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
    buf = bytearray(encode_jpeg(_smooth(8, 8)))
    # repoint the luma quant table to an undefined id: the scan's
    # components then reference a table that was never defined
    i = bytes(buf).index(b"\xff\xdb")
    assert buf[i + 4] == 0x00
    buf[i + 4] = 0x07
    with pytest.raises((ValueError, struct.error, IndexError, KeyError)):
        decode_jpeg(bytes(buf))


def test_rejects_oversize_dimensions():
    with pytest.raises(ValueError, match="16-bit"):
        encode_jpeg(np.zeros((70000, 8, 3), dtype=np.uint8))


def test_fill_bytes_before_markers_tolerated():
    buf = encode_jpeg(_smooth(8, 8))
    i = buf.index(b"\xff\xdb")
    padded = buf[:i] + b"\xff\xff" + buf[i:]  # legal B.1.1.2 padding
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(buf))


def test_truncated_stream_raises_not_hangs():
    buf = encode_jpeg(_smooth(16, 16))
    with pytest.raises((ValueError, struct.error, IndexError, KeyError)):
        decode_jpeg(buf[: len(buf) // 2])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        quality=st.integers(1, 100),
        seed=st.integers(0, 2**31),
    )
    def test_roundtrip_property(h, w, quality, seed):
        """Any image, any quality: encode|decode never crashes, shape
        is preserved, output is deterministic, and at high quality the
        error stays quantization-bounded."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = encode_jpeg(img, quality=quality)
        assert buf == encode_jpeg(img, quality=quality)
        out = decode_jpeg(buf)
        assert out.shape == img.shape and out.dtype == np.uint8
        if quality >= 90:
            err = np.abs(out.astype(int) - img.astype(int)).mean()
            assert err < 16.0, (h, w, quality, err)
except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
