"""Unit tests for the pure-Python BMP/WAV codecs (no Spark)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gis_city_county_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_bmp,
    encode_wav,
    resize_image,
)


def test_bmp_roundtrip_padded_rows():
    # width 5 -> 15-byte raw rows, 1-byte padding exercised
    img = ((np.arange(3 * 5 * 3).reshape(3, 5, 3) * 7) % 256).astype(np.uint8)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_bmp_top_down_negative_height():
    """BMPs with negative biHeight store rows top-down; decode must
    not flip them."""
    img = ((np.arange(2 * 4 * 3).reshape(2, 4, 3) * 13) % 256).astype(np.uint8)
    buf = bytearray(encode_bmp(img))
    w, h = struct.unpack_from("<ii", buf, 18)
    # rewrite height negative and reorder the pixel rows to top-down
    struct.pack_into("<ii", buf, 18, w, -h)
    data_off = struct.unpack_from("<I", buf, 10)[0]
    stride = (w * 3 + 3) // 4 * 4
    rows = [
        bytes(buf[data_off + i * stride : data_off + (i + 1) * stride])
        for i in range(h)
    ]
    buf[data_off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_image(bytes(buf)), img)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_image(b"PNG....not.a.bmp" + b"\x00" * 64)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    buf = bytearray(encode_bmp(img))
    struct.pack_into("<H", buf, 28, 8)  # bpp=8 unsupported
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_image(bytes(buf))


def test_wav_roundtrip_16_and_8_bit():
    s16 = (np.arange(97) * 211 % 4001) - 2000
    dec, rate = decode_audio(encode_wav(s16, 44100, bits=16))
    assert rate == 44100 and np.array_equal(dec[:, 0], s16)
    s8 = np.arange(33) * 5 % 256
    dec8, _ = decode_audio(encode_wav(s8, 8000, bits=8))
    assert np.array_equal(dec8[:, 0], s8)


def test_wav_skips_extra_chunks_and_multichannel():
    """RIFF walkers must skip unknown chunks (LIST/INFO) and split
    interleaved channels."""
    stereo = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)  # L,R pairs
    data = stereo.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 8000 * 4, 4, 16)
    junk = struct.pack("<4sI", b"LIST", 5) + b"INFO\x00" + b"\x00"  # odd size padded
    payload = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(junk) + 8 + len(data), b"WAVE")
        + fmt + junk + struct.pack("<4sI", b"data", len(data)) + data
    )
    samples, rate = decode_audio(payload)
    assert rate == 8000
    assert samples.shape == (3, 2)
    assert np.array_equal(samples[:, 0], [1, 2, 3])
    assert np.array_equal(samples[:, 1], [-1, -2, -3])


def test_wav_rejects_invalid():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_audio(b"OGGS" + b"\x00" * 40)
    # fmt present but compressed format code
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 85, 1, 8000, 8000, 1, 16)
    data = struct.pack("<4sI", b"data", 0)
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_audio(payload)


def test_resize_identity_and_downsample():
    img = ((np.arange(8 * 8 * 3).reshape(8, 8, 3) * 3) % 256).astype(np.uint8)
    same = decode_image(resize_image(encode_bmp(img), 8, 8))
    assert np.array_equal(same, img)
    half = decode_image(resize_image(encode_bmp(img), 4, 4))
    assert np.array_equal(half, img[::2, ::2])
