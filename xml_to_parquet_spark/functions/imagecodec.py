"""Stdlib-only image codecs (PNG via zlib+struct, BMP via struct).

Retires the round-1/2 ``decode_image_stub``: the container has no
PIL/libvips, but PNG and BMP are decodable with nothing beyond the standard
library plus numpy, which makes the multimodal decode path REAL end-to-end
— actual compressed bytes in a binary column, actual inflate + scanline
reconstruction in the executor, oracle-checked pixel statistics out.

Supported surface (deliberately minimal, asserts otherwise):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA); all five
  scanline filters (None/Sub/Up/Average/Paeth) on decode; no interlacing.
- BMP: uncompressed 24-bit BI_RGB, bottom-up rows.

The reference repo (/root/reference/) has no multimodal support at all, so
this is [EXT] surface per SURVEY.md §2.2.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a uint8 array — (h, w) gray, (h, w, 3) RGB or (h, w, 4)
    RGBA — as a PNG (filter 0 on every scanline)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.reshape(h, -1)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into a uint8 array — (h, w) for gray, (h, w, c)
    otherwise. Handles all five scanline filter types.

    Filter reconstruction strategy (this is executor-side hot path under
    mapInPandas, so per-pixel numpy scalar indexing is banned):
    - 0 (None) / 2 (Up): whole-row numpy vector ops.
    - 1 (Sub): rec[x] = line[x] + rec[x-c] mod 256 is a per-channel-lane
      prefix sum, and mod-256 distributes over addition, so it collapses
      to ``cumsum(axis=0) & 0xFF`` — exact and fully vectorized.
    - 3 (Average) / 4 (Paeth): the floor-divide / predictor choice makes
      the recurrence genuinely sequential; run it as a pure-Python
      bytearray loop with locals hoisted (≈10× faster than indexing a
      numpy array element-wise, and allocation-free per row).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(payload) < 13:
                raise ValueError("truncated PNG IHDR")
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if depth != 8 or color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} color={color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            meta = (w, h, _CHANNELS[color_type])
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, c = meta
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # failure CONTRACT: malformed input raises ValueError, never a
        # library-specific error type, so the mapInPandas chassis can
        # apply one skip/raise policy (same contract as the JPEG codec)
        raise ValueError(f"PNG inflate failed: {e}") from e
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows_out: list[bytes] = []
    zero = bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        prv = rows_out[-1] if rows_out else zero
        if f == 0:
            rows_out.append(raw[off + 1 : off + 1 + stride])
        elif f == 1:  # Sub → per-lane cumsum mod 256 (vectorized, exact)
            lane = (
                np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
                .reshape(w, c)
                .astype(np.uint32)
            )
            rows_out.append(
                (lane.cumsum(axis=0) & 0xFF).astype(np.uint8).tobytes()
            )
        elif f == 2:  # Up → whole-row vector add
            line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
            up = np.frombuffer(prv, np.uint8)
            rows_out.append((line + up).tobytes())  # uint8 add wraps mod 256
        elif f == 3:  # Average — sequential; tight bytearray loop
            cur = bytearray(raw[off + 1 : off + 1 + stride])
            for x in range(c):
                cur[x] = (cur[x] + (prv[x] >> 1)) & 0xFF
            for x in range(c, stride):
                cur[x] = (cur[x] + ((cur[x - c] + prv[x]) >> 1)) & 0xFF
            rows_out.append(bytes(cur))
        elif f == 4:  # Paeth — sequential; tight bytearray loop, inlined
            cur = bytearray(raw[off + 1 : off + 1 + stride])
            for x in range(c):  # left & upper-left are 0 → predictor is up
                cur[x] = (cur[x] + prv[x]) & 0xFF
            for x in range(c, stride):
                a = cur[x - c]
                b = prv[x]
                cc = prv[x - c]
                p = a + b - cc
                pa = p - a
                if pa < 0:
                    pa = -pa
                pb = p - b
                if pb < 0:
                    pb = -pb
                pc = p - cc
                if pc < 0:
                    pc = -pc
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[x] = (cur[x] + pred) & 0xFF
            rows_out.append(bytes(cur))
        else:
            raise ValueError(f"bad PNG filter {f}")
    arr = np.frombuffer(b"".join(rows_out), np.uint8).reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode a uint8 array — (h, w) gray (expanded to RGB) or (h, w, 3)
    RGB — as an uncompressed 24-bit bottom-up BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = img[:, :, ::-1]
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1))
    pixel_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(data) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        raise ValueError("truncated BMP header")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = []
    for y in range(h):
        off = pixel_offset + y * stride
        rows.append(np.frombuffer(data, dtype=np.uint8, count=row_bytes, offset=off))
    arr = np.stack(rows[::-1] if bottom_up else rows).reshape(h, w, 3)
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def resize_box2(img: np.ndarray) -> np.ndarray:
    """2x2 box-filter (mean-pooling) downscale of an even-dimensioned
    gray image; integer mean with floor division, so the result is exact
    and closed-form checkable. The mipmap/antialias tier of a resize
    ladder (each application halves both dimensions)."""
    h, w = img.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, "box2 needs even dims"
    s = img.astype(np.int64).reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    return (s // 4).astype(np.uint8)


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w): source index
    floor(i * src / out) per axis — one vectorized index gather, exact
    integer arithmetic (the thumbnail-normalization tier)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]
