"""GIF87a codec (functions/gifcodec.py): exactness and wire-format
contracts. GIF is lossless, so every roundtrip must be bit-exact —
including images large enough to exercise variable code widths up to 12
bits and the dictionary-overflow clear path."""

from __future__ import annotations

import numpy as np
import pytest

from xml_to_parquet_spark.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_roundtrip_exact_across_shapes_and_content():
    rng = np.random.default_rng(3)
    for shape in [(8, 8), (19, 23), (31, 31), (1, 5), (3, 1), (64, 64)]:
        for img in (
            rng.integers(0, 256, shape, dtype=np.uint8),
            np.full(shape, 77, np.uint8),
            (np.add.outer(np.arange(shape[0]) * 5, np.arange(shape[1]) * 3) % 256)
            .astype(np.uint8),
        ):
            out = decode_gif(encode_gif(img))
            assert out.shape == img.shape
            assert np.array_equal(out, img)


def test_dictionary_overflow_clear_path_exact():
    """A 200x200 noise image forces >4096 LZW entries, so the encoder
    must emit a mid-stream clear code; the decoder must resynchronize."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (200, 200), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_width_schedule_is_early_change():
    """Feed enough distinct pairs to cross the 512-entry boundary: the
    encoder emits 10-bit codes from entry 512 on, and the decoder (whose
    table lags by one) must follow — a plain roundtrip through the raw
    LZW layer with content engineered to defeat run coalescing."""
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_wire_format_fields():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = encode_gif(img)
    assert b[:6] == b"GIF87a"
    assert b[-1:] == b"\x3b"
    w, h = int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
    assert (w, h) == (8, 8)
    # global color table flag set, 256-entry table
    assert b[10] & 0x80
    # byte determinism
    assert encode_gif(img) == b


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    img = np.zeros((4, 4), np.uint8)
    b = bytearray(encode_gif(img))
    # flip the interlace flag in the image descriptor, which sits right
    # after the 13-byte header+LSD and the 768-byte gray palette (a bare
    # index() would find 0x2c inside palette entry 44)
    idesc = 13 + 768
    assert b[idesc] == 0x2C
    b[idesc + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif(bytes(b))


def test_decode_truncated_raises_valueerror():
    """Truncation anywhere (palette, descriptor, mid-sub-block) must
    surface as the documented ValueError, not IndexError/struct.error."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    full = encode_gif(img)
    for cut in (10, 100, 700, len(full) - 10, len(full) - 2):
        with pytest.raises(ValueError):
            decode_gif(full[:cut])


def test_decode_gif89a_with_extension_and_local_table():
    """The decoder must handle GIF89a wire variants the encoder never
    emits: a graphic-control extension before the image descriptor, and
    a LOCAL color table overriding the global one."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = bytearray(encode_gif(img))
    b[:6] = b"GIF89a"
    idesc = 13 + 768
    # splice a graphic-control extension (0x21 0xF9, 4-byte block, term)
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(b[:idesc]) + ext + bytes(b[idesc:])
    assert np.array_equal(decode_gif(spliced), img)
    # move the palette into a LOCAL color table: strip the global one,
    # set the local-table flag on the image descriptor, insert the table
    no_global = bytearray(spliced)
    no_global[10] &= 0x7F  # clear global-table flag
    del no_global[13 : 13 + 768]
    idesc2 = 13 + len(ext)
    assert no_global[idesc2] == 0x2C
    no_global[idesc2 + 9] |= 0x87  # local table flag + 256 entries
    local = bytes(v for i in range(256) for v in (i, i, i))
    with_local = (
        bytes(no_global[: idesc2 + 10]) + local + bytes(no_global[idesc2 + 10 :])
    )
    assert np.array_equal(decode_gif(with_local), img)


def test_gif_corrupt_lzw_bytes_never_crash():
    """Failure-contract fuzz mirroring the JPEG/PNG codecs: flipping any
    byte from the image-data sub-blocks through the trailer must either
    raise ValueError (bad LZW code, truncated sub-block, unexpected
    block, pixel-count mismatch at reshape) or decode to the original
    shape/dtype — never IndexError/struct.error/KeyError or a hang."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xml_to_parquet_spark.functions.gifcodec import decode_gif, encode_gif

    img = ((np.arange(13 * 9).reshape(13, 9) * 41) % 256).astype(np.uint8)
    good = encode_gif(img)
    # the image separator sits past the 13-byte header+LSD AND the
    # 768-byte gray palette — a bare index() finds palette entry 44
    # (0x2C,0x2C,0x2C) instead and fuzzes the descriptor it meant to skip
    data_start = good.index(b"\x2c", 13 + 768) + 11  # descriptor + min-code
    assert good[13 + 768] == 0x2C
    want_shape = img.shape

    @settings(max_examples=300, deadline=None)
    @given(
        off=st.integers(min_value=data_start, max_value=len(good) - 1),
        flip=st.integers(min_value=1, max_value=255),
    )
    def check(off, flip):
        bad = good[:off] + bytes([good[off] ^ flip]) + good[off + 1 :]
        try:
            out = decode_gif(bad)
        except ValueError:
            return
        assert out.shape == want_shape
        assert out.dtype == np.uint8

    check()


def test_gif_lzw_longer_than_image_raises():
    """Regression pin for the r13-judge counterexample (off=786, flip=1):
    flipping the image-descriptor width low byte (13x9 -> 13x8) leaves an
    LZW stream that encodes MORE pixels than the header's w*h. The
    decoder must raise ValueError, never silently truncate to a
    plausible wrong image."""
    img = ((np.arange(13 * 9).reshape(13, 9) * 41) % 256).astype(np.uint8)
    good = encode_gif(img)
    off, flip = 786, 1  # descriptor width low byte: 9 -> 8
    assert good[13 + 768] == 0x2C
    bad = good[:off] + bytes([good[off] ^ flip]) + good[off + 1 :]
    with pytest.raises(ValueError, match="longer than image"):
        decode_gif(bad)
    # the raw-LZW layer enforces the same contract directly: decoding a
    # 117-pixel stream while claiming 104 pixels must raise, both when
    # the overrun lands mid-entry and when data codes follow a clean cut
    stream = _lzw_encode(img.tobytes())
    with pytest.raises(ValueError, match="longer than image"):
        _lzw_decode(stream, img.size - 13)
    with pytest.raises(ValueError, match="longer than image"):
        _lzw_decode(stream, img.size - 1)
