"""GIF87a codec — stdlib-only, grayscale via a 256-entry gray palette.

Real LZW: variable-width codes (9→12 bits, LSB-first bit packing), clear /
end-of-information codes, dictionary reset on overflow, 255-byte data
sub-blocks — the full GIF compression chain, both directions. The encoder
exists so executors can synthesize deterministic fixtures; the decoder is
the operator under test (mm_decode_gif), whose oracle recomputes pixel
statistics from the closed-form image formula: any bug in the bit
unpacking, code-width schedule, dictionary rebuild, or palette mapping
breaks value parity.

Parity with the reference conversion surface: like imagecodec.py (PNG/BMP)
and jpegcodec.py, this extends the engine's opaque-binary multimodal
column (SURVEY.md §2.2 north star) — the reference repo has no image
surface; these operators are [EXT].
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257
_MAX_CODE = 4096  # 12-bit ceiling per the GIF spec


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("LZW stream truncated")
        val = 0
        got = 0
        while got < width:
            byte = self.data[(self.pos + got) // 8]
            bit_off = (self.pos + got) % 8
            take = min(8 - bit_off, width - got)
            val |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return val


def _lzw_encode(indices: bytes) -> bytes:
    """GIF LZW with min code size 8 (256-color image)."""
    bw = _BitWriter()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    bw.write(_CLEAR, width)
    w = b""
    for ch in indices:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            # dictionary full: reset (keeps the decoder's mirror simple
            # and exercises the clear-code path on large images)
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            width = 9
        w = bytes([ch])
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    br = _BitReader(data)
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    saw_eoi = False
    while len(out) < n_expected:
        code = br.read(width)
        if code == _CLEAR:
            width = 9
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            prev = None
            continue
        if code == _EOI:
            saw_eoi = True
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        prev = entry
        # the decoder's table lags the encoder's by one entry (it appends
        # only after seeing the NEXT code), so the width bump fires at
        # len+1 — the standard GIF "early change" synchronization
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
    # Failure contract (found by hypothesis, off=786 flip=1 in a 13x9
    # fixture whose descriptor width byte was flipped to 13x8): a stream
    # that encodes MORE pixels than the caller's w*h must raise, never
    # silently truncate to a plausible wrong image. Two overrun shapes:
    if len(out) > n_expected:
        # the final multi-byte entry ran past the pixel count
        raise ValueError("LZW stream longer than image")
    if not saw_eoi:
        # exactly n_expected pixels without reaching EOI: the stream must
        # now end (bit-level padding shorter than one code is fine) or
        # yield EOI, optionally after CLEARs — any further data code means
        # the stream encodes more pixels than the descriptor claims.
        while br.pos + width <= len(br.data) * 8:
            code = br.read(width)
            if code == _CLEAR:
                width = 9
                continue
            if code == _EOI:
                break
            raise ValueError("LZW stream longer than image")
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 grayscale array as a GIF87a with a gray global
    color table (pixel value == palette index)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gif expects a 2-D uint8 array")
    h, w = img.shape
    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gray_palette()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(img.tobytes())
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a GIF87a/89a with a global color table and a single
    non-interlaced image; returns the 2-D uint8 luminance array (palette
    entries are averaged, exact for gray palettes). Multi-image GIFs
    return the FIRST frame (historical contract; use decode_gif_frames
    for animations). Any malformed or TRUNCATED input raises ValueError
    (the documented contract a caller's quarantine path relies on), never
    a bare IndexError/struct.error."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return next(_iter_gif_frames(data))
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt GIF: {exc}") from exc


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode EVERY image block of a GIF87a/89a animation, in stream
    order — the frame-extraction primitive mm_video_framesample builds
    on. Same failure contract as decode_gif: ValueError on any malformed
    or truncated input."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return list(_iter_gif_frames(data))
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt GIF: {exc}") from exc


def _iter_gif_frames(data: bytes):
    """Yield each image block's luminance array; raises ValueError inside
    iteration on structural errors (callers wrap)."""
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated color table")
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    n_images = 0
    while True:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if n_images == 0:
                raise ValueError("no image data")
            return
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        frame, pos = _read_image_block(data, pos, palette)
        n_images += 1
        yield frame


def _read_image_block(
    data: bytes, pos: int, palette: np.ndarray | None
) -> tuple[np.ndarray, int]:
    """Parse one image block (descriptor at ``pos``, just past the 0x2C
    separator); returns (luminance array, position past the block
    terminator)."""
    _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
    pos += 9
    if iflags & 0x40:
        raise ValueError("interlaced GIFs not supported")
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated color table")
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if palette is None:
        raise ValueError("no color table")
    min_code = data[pos]
    pos += 1
    if min_code != 8:
        raise ValueError("only 8-bit palettes supported")
    lzw = bytearray()
    while data[pos]:
        ln = data[pos]
        if pos + 1 + ln > len(data):
            raise ValueError("truncated image data sub-block")
        lzw += data[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    pos += 1  # block terminator
    indices = np.frombuffer(_lzw_decode(bytes(lzw), w * h), np.uint8)
    if indices.size != w * h:
        raise ValueError("LZW stream shorter than image")
    gray = (palette.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
    return gray[indices].reshape(h, w), pos


def encode_gif_anim(frames: list[np.ndarray]) -> bytes:
    """Encode same-sized 2-D uint8 frames as a multi-image GIF89a with a
    gray global color table — one image block per frame (GIF's animation
    container, minus the per-frame delay extensions a viewer would want;
    decode_gif_frames ignores extensions either way)."""
    if not frames:
        raise ValueError("encode_gif_anim expects at least one frame")
    h, w = frames[0].shape
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 2 or f.shape != (h, w):
            raise ValueError("encode_gif_anim expects same-sized 2-D uint8 frames")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gray_palette()
    for f in frames:
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW minimum code size
        lzw = _lzw_encode(f.tobytes())
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out += b"\x3B"
    return bytes(out)
