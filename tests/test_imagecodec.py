"""Unit tests for the stdlib PNG/BMP codec (functions/imagecodec.py).

Round-trips cover gray/RGB/RGBA and odd widths (BMP row padding); the
filter tests hand-encode PNGs with each of the five scanline filters so the
decoder's reconstruction logic is exercised beyond what our filter-0
encoder produces (real-world PNGs use Sub/Up/Average/Paeth heavily).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xml_to_parquet_spark.functions.imagecodec import (
    _chunk,
    _paeth,
    _PNG_SIG,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)


def _rng_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape", [(5, 9), (8, 8, 3), (3, 7, 4), (1, 1), (2, 1, 3)]
)
def test_png_roundtrip(shape):
    img = _rng_img(shape)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("shape", [(5, 9), (8, 8, 3), (4, 6), (1, 3, 3)])
def test_bmp_roundtrip(shape):
    img = _rng_img(shape)
    expect = np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img
    out = decode_bmp(encode_bmp(img))
    np.testing.assert_array_equal(out, expect)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Hand-encode `img` applying PNG filter `ftype` to every scanline."""
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[c]
    rows = img.reshape(h, -1).astype(np.int32)
    stride = w * c
    raw = bytearray()
    for y in range(h):
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros(stride, dtype=np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = prev[x]
            elif ftype == 3:
                pred = (left + prev[x]) >> 1
            else:
                pred = _paeth(int(left), int(prev[x]), int(ul))
            filt[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(6, 5), (4, 4, 3)])
def test_png_all_filters_decode(ftype, shape):
    img = _rng_img(shape, seed=ftype + 11)
    out = decode_png(_png_with_filter(img, ftype))
    np.testing.assert_array_equal(out, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_bmp(b"XX123")


def test_png_multiple_idat_chunks():
    img = _rng_img((4, 4))
    data = encode_png(img)
    # split the single IDAT into two chunks: parsers must concatenate
    sig_ihdr = data[: 8 + 12 + 13]
    (ln,) = struct.unpack_from(">I", data, 8 + 12 + 13)
    idat = data[8 + 12 + 13 + 8 : 8 + 12 + 13 + 8 + ln]
    rebuilt = (
        sig_ihdr
        + _chunk(b"IDAT", idat[: ln // 2])
        + _chunk(b"IDAT", idat[ln // 2 :])
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(rebuilt), img)
