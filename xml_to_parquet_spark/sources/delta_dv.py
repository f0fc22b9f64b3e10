"""Deletion-vector decoding for the Delta Lake log adapter.

Delta's row-level deletes (delta-io PROTOCOL.md, "Deletion Vectors")
attach a `deletionVector` descriptor to an `add` action; the descriptor
locates a serialized RoaringBitmapArray whose set bits are the 0-based
ROW INDEXES of the file's deleted rows. This module turns a descriptor
into a numpy array of those indexes, from public specs only:

  * the descriptor (PROTOCOL.md "Deletion Vector Descriptor Schema"):
    `storageType` 'u' (relative file, UUID-named), 'p' (absolute-path
    file), or 'i' (inline); `pathOrInlineDv`; `offset` (on-disk forms);
    `sizeInBytes` (bitmap byte length); `cardinality` (deleted count);
  * the on-disk DV file (PROTOCOL.md "Deletion Vector File Storage
    Format"): a 1-byte format version (1), then per stored DV a 4-byte
    BIG-endian length, the bitmap bytes, and a 4-byte big-endian CRC-32
    of those bytes — `offset` points at the length field;
  * Z85 (ZeroMQ RFC 32): 'u' encodes the 16-byte UUID as 20 chars; 'i'
    encodes the bitmap itself (zero-padded to a 4-byte multiple, which
    is why decode truncates to `sizeInBytes`);
  * the bitmap (PROTOCOL.md "Deletion Vector Format"): magic 1681511377
    (4 bytes little-endian), then the 64-bit "portable" RoaringBitmap
    layout (github.com/RoaringBitmap/RoaringFormatSpec): an 8-byte LE
    bitmap count, then per bitmap a 4-byte LE high-32-bit key followed
    by one standard 32-bit roaring serialization (cookie / descriptive
    header / optional offset header / array|bitmap|run containers).

Everything here is driver-or-executor-side pure computation over
`sizeInBytes`-long buffers — the compressed-deleted-set size, never the
data size — so the cost shape matches every other log-metadata path in
delta_log.py. The scan-side application (an anti-join on
`_metadata.row_index`) lives in delta_log._apply_deletion_vectors.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

# --- Z85 (ZeroMQ RFC 32) ----------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(encoded: str, out_len: int | None = None) -> bytes:
    """Decode Z85 text (5 chars -> 4 bytes, big-endian base 85).

    Delta's codec zero-pads the plaintext to a 4-byte multiple before
    encoding, so callers that know the true length (`sizeInBytes` for
    inline DVs, 16 for UUIDs) pass ``out_len`` to strip the pad."""
    if len(encoded) % 5:
        raise ValueError(
            f"Z85 text length {len(encoded)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(encoded), 5):
        value = 0
        for ch in encoded[i : i + 5]:
            idx = _Z85_INDEX.get(ch)
            if idx is None:
                raise ValueError(f"character {ch!r} is not in the Z85 alphabet")
            value = value * 85 + idx
        if value > 0xFFFFFFFF:
            raise ValueError(f"Z85 block {encoded[i:i + 5]!r} overflows 32 bits")
        out += value.to_bytes(4, "big")
    if out_len is not None:
        if out_len > len(out):
            raise ValueError(
                f"Z85 payload is {len(out)} bytes, shorter than the "
                f"declared length {out_len}"
            )
        del out[out_len:]
    return bytes(out)


# --- descriptor -> raw bitmap bytes -----------------------------------------


def dv_file_path(descriptor: dict, table_path: str) -> str:
    """Absolute path of an on-disk DV file ('u' and 'p' storage).

    'u': pathOrInlineDv is `<optional random prefix><20-char Z85 UUID>`;
    the file lives at `<table>/<prefix>/deletion_vector_<uuid>.bin`.
    'p': pathOrInlineDv is the absolute path itself (a `file:` scheme is
    tolerated and stripped; remote schemes are refused — this adapter
    reads the local filesystem only)."""
    storage = descriptor.get("storageType")
    raw = descriptor.get("pathOrInlineDv") or ""
    if storage == "u":
        if len(raw) < 20:
            raise ValueError(
                f"storageType 'u' needs >=20 chars of pathOrInlineDv, got {raw!r}"
            )
        prefix, encoded = raw[:-20], raw[-20:]
        uid = _uuid.UUID(bytes=z85_decode(encoded, 16))
        return os.path.join(table_path, prefix, f"deletion_vector_{uid}.bin")
    if storage == "p":
        path = raw
        if "://" in path or path.startswith("file:"):
            if not path.startswith("file:"):
                raise ValueError(
                    f"deletion vector at non-local URI {path!r}: this "
                    "adapter reads the local filesystem only"
                )
            path = "/" + path.split(":", 1)[1].lstrip("/")
        return path
    raise ValueError(f"unknown deletionVector storageType {storage!r}")


def load_dv_bytes(descriptor: dict, table_path: str) -> bytes:
    """The serialized RoaringBitmapArray for one descriptor, verified.

    On-disk forms check the file format version byte, the 4-byte
    big-endian length at `offset` against `sizeInBytes`, and the
    trailing CRC-32 — a torn or corrupt DV must fail loudly, because a
    silently-wrong deleted set resurrects or loses rows."""
    storage = descriptor.get("storageType")
    size = int(descriptor.get("sizeInBytes", -1))
    if size < 0:
        raise ValueError(f"deletionVector descriptor lacks sizeInBytes: {descriptor}")
    if storage == "i":
        return z85_decode(descriptor.get("pathOrInlineDv") or "", size)
    path = dv_file_path(descriptor, table_path)
    offset = int(descriptor.get("offset", 1))
    with open(path, "rb") as fh:
        version = fh.read(1)
        if version != b"\x01":
            raise ValueError(
                f"DV file {path} has format version {version!r}, expected 1"
            )
        fh.seek(offset)
        header = fh.read(4)
        if len(header) < 4:
            raise ValueError(f"DV file {path} truncated at offset {offset}")
        stored_size = struct.unpack(">i", header)[0]
        if stored_size != size:
            raise ValueError(
                f"DV at {path}:{offset} declares {stored_size} bytes but the "
                f"descriptor says {size}"
            )
        data = fh.read(size)
        if len(data) != size:
            raise ValueError(f"DV file {path} truncated: wanted {size} bytes")
        crc_bytes = fh.read(4)
        if len(crc_bytes) < 4:
            raise ValueError(f"DV file {path} truncated before its checksum")
        expected = struct.unpack(">I", crc_bytes)[0]
        actual = zlib.crc32(data) & 0xFFFFFFFF
        if actual != expected:
            raise ValueError(
                f"DV at {path}:{offset} fails its CRC-32 "
                f"(stored {expected:#010x}, computed {actual:#010x})"
            )
    return data


# --- RoaringBitmapArray (portable) -> row indexes ---------------------------

_MAGIC = 1681511377
_SERIAL_COOKIE = 12347  # run-container-capable format (RoaringFormatSpec)
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4  # offsets omitted for run-format with < 4 containers


def _unpack(fmt: str, data: bytes, pos: int):
    """Bounds-checked struct.unpack_from: truncated bitmap bytes surface
    as the documented ValueError, never struct.error (failure-contract
    discipline; the DV corruption fuzz pins this)."""
    need = struct.calcsize(fmt)
    if pos + need > len(data):
        raise ValueError(
            f"deletion vector truncated: wanted {need} bytes at {pos}, "
            f"have {len(data) - pos}"
        )
    return struct.unpack_from(fmt, data, pos)[0]


def decode_dv_positions(data: bytes) -> np.ndarray:
    """Sorted int64 row indexes from a serialized RoaringBitmapArray.

    Layout (PROTOCOL.md + RoaringFormatSpec 64-bit "portable"):
    magic i32 LE, bitmap count i64 LE, then per bitmap a u32 LE key (the
    high 32 bits of every position it holds) and one 32-bit roaring
    serialization. Cost and memory are O(cardinality) output plus
    O(sizeInBytes) input — independent of the data file's row count."""
    if len(data) < 12:
        raise ValueError(f"deletion vector of {len(data)} bytes is too short")
    magic = struct.unpack_from("<i", data, 0)[0]
    if magic != _MAGIC:
        raise ValueError(
            f"deletion vector magic {magic} != {_MAGIC}; not a "
            "RoaringBitmapArray portable serialization"
        )
    n_bitmaps = struct.unpack_from("<q", data, 4)[0]
    if n_bitmaps < 0:
        raise ValueError(f"negative bitmap count {n_bitmaps}")
    pos = 12
    chunks: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        if pos + 4 > len(data):
            raise ValueError("deletion vector truncated before a bitmap key")
        key = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if key >= 1 << 31:
            # (key << 32) | low32 would exceed int64 — no real row index
            # does (Delta row indexes are int64); numpy would otherwise
            # promote the addition to float64 and hand back silently
            # WRONG positions (found by the corruption fuzz)
            raise ValueError(
                f"bitmap key {key} exceeds the int64 row-index range"
            )
        values, pos = _decode_roaring32(data, pos)
        chunks.append(values.astype(np.int64) + (int(key) << 32))
    out = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    return np.sort(out)


def _decode_roaring32(data: bytes, pos: int) -> tuple[np.ndarray, int]:
    """One standard 32-bit roaring bitmap starting at ``pos``; returns
    (sorted uint32 values, position after the bitmap). Follows
    RoaringFormatSpec exactly: the two cookies, the (key, cardinality-1)
    descriptive header, the offset header (always present without runs;
    present with runs only at >= 4 containers — skipped either way, the
    containers are read sequentially), and the three container codecs."""
    cookie = _unpack("<I", data, pos)
    if cookie & 0xFFFF == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        run_bytes = (size + 7) // 8
        run_bitset = data[pos + 4 : pos + 4 + run_bytes]
        if len(run_bitset) != run_bytes:
            raise ValueError("roaring bitmap truncated in its run bitset")
        header = pos + 4 + run_bytes
        has_runs = True
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        size = _unpack("<I", data, pos + 4)
        header = pos + 8
        has_runs = False
        run_bitset = b""
    else:
        raise ValueError(f"unknown roaring cookie {cookie} at byte {pos}")
    keys_cards = np.frombuffer(data, dtype="<u2", count=2 * size, offset=header)
    body = header + 4 * size
    if not has_runs or size >= _NO_OFFSET_THRESHOLD:
        body += 4 * size  # offset header: redundant for a sequential read
    values: list[np.ndarray] = []
    for i in range(size):
        key = int(keys_cards[2 * i])
        card = int(keys_cards[2 * i + 1]) + 1
        if has_runs and run_bitset[i // 8] & (1 << (i % 8)):
            n_runs = _unpack("<H", data, body)
            body += 2
            runs = np.frombuffer(
                data, dtype="<u2", count=2 * n_runs, offset=body
            ).reshape(n_runs, 2)
            body += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                    for s, ln in runs
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif card <= 4096:
            vals = np.frombuffer(
                data, dtype="<u2", count=card, offset=body
            ).astype(np.uint32)
            body += 2 * card
        else:
            words = np.frombuffer(data, dtype=np.uint8, count=8192, offset=body)
            body += 8192
            vals = np.nonzero(np.unpackbits(words, bitorder="little"))[0].astype(
                np.uint32
            )
            if len(vals) != card:
                raise ValueError(
                    f"bitmap container declares cardinality {card} but "
                    f"holds {len(vals)} set bits"
                )
        values.append((np.uint32(key) << np.uint32(16)) | vals)
    out = (
        np.concatenate(values) if values else np.empty(0, dtype=np.uint32)
    )
    return out, body
