"""Decode-only Apache Avro reader (object container files + datums).

Iceberg's table metadata is JSON, but its manifest lists and manifests
are Avro object container files — the one reason the lake story stopped
at Delta ("Iceberg manifests are Avro, unreadable stdlib-only"). This
module removes that constraint from first principles: the Avro 1.11
specification (avro.apache.org/docs/current/specification) defines both
layers completely, and every piece is stdlib-decodable:

  * object container file: magic ``Obj\\x01``, a file-metadata map
    (``avro.schema`` = the writer's schema as JSON, ``avro.codec``), a
    16-byte sync marker, then data blocks — each a record count, a
    byte length, the (possibly deflate-compressed) encoded records, and
    the sync marker again (verified; a mismatch means a torn file);
  * binary datum encoding: int/long are zigzag varints; float/double
    little-endian IEEE; bytes/string length-prefixed; records are their
    fields in declaration order; enums an int index; arrays and maps are
    blocks terminated by a zero count (a negative count carries a block
    byte size to enable skipping — honored here); unions a long branch
    index then the branch datum; fixed is raw bytes.

Scope: reading with the WRITER's schema only (exactly what a container
file consumer needs — the schema ships inside the file), codecs null
and deflate (zlib, the two the spec requires/recommends; snappy is
refused loudly). No writer path. Schemas may reference previously
defined named types by full name, which Iceberg's manifest schemas use.

Decoding is driver-side and manifest-sized — the same O(metadata) cost
class as the Delta log replay; data files are never touched here.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Malformed or unsupported Avro bytes — never guessed around."""


class _Cursor:
    """Sequential reader over one decoded block (or the file header)."""

    __slots__ = ("buf", "pos", "zero_byte_items")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        # Running total of items decoded from zero-byte-datum blocks,
        # CUMULATIVE across every array/map in this cursor's lifetime —
        # a per-block cap alone still lets a small crafted file chain
        # many sub-cap blocks into hundreds of millions of materialized
        # Python values (ADVICE r16).
        self.zero_byte_items = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError(
                f"truncated Avro data: wanted {n} bytes at {self.pos}, "
                f"have {len(self.buf) - self.pos}"
            )
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def read_long(self) -> int:
        """Zigzag-encoded variable-length integer (int and long alike)."""
        shift = 0
        accum = 0
        while True:
            byte = self.take(1)[0]
            accum |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint longer than 10 bytes")
        return (accum >> 1) ^ -(accum & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise AvroError(f"negative bytes length {n}")
        return self.take(n)


def _decode(schema, cur: _Cursor, names: dict):
    """One datum under the writer's ``schema`` (parsed-JSON form)."""
    if isinstance(schema, list):  # union: branch index, then the datum
        idx = cur.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} outside {len(schema)} branches")
        if isinstance(schema[idx], list):
            # spec: unions may not immediately contain other unions —
            # recursing would silently read a second branch index
            raise AvroError(
                f"union branch {idx} is itself a union: illegal Avro schema"
            )
        return _decode(schema[idx], cur, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return cur.take(1) != b"\x00"
        if t in ("int", "long"):
            return cur.read_long()
        if t == "float":
            return struct.unpack("<f", cur.take(4))[0]
        if t == "double":
            return struct.unpack("<d", cur.take(8))[0]
        if t == "bytes":
            return cur.read_bytes()
        if t == "string":
            return cur.read_bytes().decode("utf-8")
        if t in names:  # reference to a previously defined named type
            return _decode(names[t], cur, names)
        raise AvroError(f"unknown Avro type {t!r}")
    if not isinstance(schema, dict):
        raise AvroError(f"malformed schema node {schema!r}")
    t = _node(schema, "type")
    if isinstance(t, (dict, list)):  # {"type": {...}} wrapper
        return _decode(t, cur, names)
    if t == "record":
        _register_name(schema, names)
        out = {}
        for f in _node(schema, "fields"):
            if not isinstance(f, dict):
                raise AvroError(f"malformed record field {f!r}")
            out[_node(f, "name")] = _decode(_node(f, "type"), cur, names)
        return out
    if t == "enum":
        _register_name(schema, names)
        idx = cur.read_long()
        symbols = _node(schema, "symbols")
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} outside {symbols}")
        return symbols[idx]
    if t == "array":
        out = []
        item_min = _min_datum_bytes(_node(schema, "items"), names)
        while (count := cur.read_long()) != 0:
            if count < 0:  # negative count: block byte size follows
                count = -count
                cur.read_long()
            _check_block_count(count, cur, item_min)
            for _ in range(count):
                out.append(_decode(_node(schema, "items"), cur, names))
        return out
    if t == "map":
        out = {}
        while (count := cur.read_long()) != 0:
            if count < 0:
                count = -count
                cur.read_long()
            _check_block_count(count, cur)
            for _ in range(count):
                key = cur.read_bytes().decode("utf-8")
                out[key] = _decode(_node(schema, "values"), cur, names)
        return out
    if t == "fixed":
        _register_name(schema, names)
        size = _node(schema, "size")
        if not isinstance(size, int) or size < 0:
            raise AvroError(f"malformed fixed size {size!r}")
        return cur.take(size)
    return _decode(t, cur, names)  # primitive spelled as {"type": "long"}


def _node(schema: dict, key: str):
    """Required schema attribute; a corrupt embedded avro.schema must
    surface as AvroError, never KeyError (failure-contract discipline —
    the codec fuzz suites pin this)."""
    try:
        return schema[key]
    except KeyError:
        raise AvroError(
            f"malformed schema node: missing {key!r} in {schema!r}"
        ) from None


# Sanity ceiling for blocks whose items legitimately encode to ZERO
# bytes (all-null records, null items): remaining-bytes can't bound the
# count there, but honoring a forged 2^40 count would still spin/OOM.
# 2^24 items (~16.7M) is far beyond any real manifest or fixture block.
_ZERO_BYTE_COUNT_CAP = 1 << 24


def _check_block_count(count: int, cur: _Cursor, min_item_bytes: int = 1) -> None:
    """A block count beyond the remaining bytes is provably corrupt —
    WHEN each encoded item consumes at least one byte. Spec-legal
    schemas exist whose datums encode to zero bytes (a record of
    'null'-typed fields, an array of nulls — ADVICE r14), so the
    remaining-bytes bound only applies when the item schema provably
    consumes >=1 byte per datum (``min_item_bytes >= 1``); zero-byte
    item schemas fall back to a sanity cap instead of a false reject."""
    if min_item_bytes >= 1:
        if count > len(cur.buf) - cur.pos + 1:
            raise AvroError(
                f"block count {count} exceeds the {len(cur.buf) - cur.pos} "
                "bytes remaining: corrupt block"
            )
    else:
        # The cap applies to the RUNNING total of zero-byte items this
        # cursor has admitted, not just this block — chained sub-cap
        # blocks must trip it too (ADVICE r16).
        cur.zero_byte_items += count
        if cur.zero_byte_items > _ZERO_BYTE_COUNT_CAP:
            raise AvroError(
                f"cumulative zero-byte-item count {cur.zero_byte_items} "
                f"exceeds the sanity cap {_ZERO_BYTE_COUNT_CAP}: corrupt "
                "block chain"
            )


def _min_datum_bytes(schema, names: dict, _seen: frozenset = frozenset()) -> int:
    """Conservative minimum encoded size of one datum: 1 when EVERY
    possible value of ``schema`` consumes at least one byte, else 0.
    Unresolvable references and cycles return 0 (conservative — the
    caller then skips the remaining-bytes bound rather than risking a
    false reject of a valid file)."""
    if isinstance(schema, list):  # union: branch index varint >= 1 byte
        return 1
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            name = schema.get("name")
            if name in _seen:
                return 0  # recursive record: be conservative
            seen = _seen | {name} if name else _seen
            return (
                1
                if any(
                    _min_datum_bytes(f.get("type"), names, seen)
                    for f in schema.get("fields", [])
                    if isinstance(f, dict)
                )
                else 0
            )
        if t == "fixed":
            size = schema.get("size")
            return 1 if isinstance(size, int) and size >= 1 else 0
        if t in ("array", "map"):
            return 1  # terminating zero block count is >= 1 byte
        if t == "enum":
            return 1
        return _min_datum_bytes(t, names, _seen)
    if schema == "null":
        return 0
    if isinstance(schema, str) and schema in names:
        if schema in _seen:
            return 0
        return _min_datum_bytes(names[schema], names, _seen | {schema})
    if isinstance(schema, str) and schema not in (
        "boolean", "int", "long", "float", "double", "string", "bytes",
    ):
        return 0  # unknown reference: conservative
    return 1


def _register_name(schema: dict, names: dict, ns: str | None = None) -> str | None:
    """Register a named type under its FULLNAME per the spec's name
    resolution: a dotted `name` IS the fullname; else an explicit
    `namespace` applies; else the ENCLOSING namespace ``ns`` is
    inherited (ADVICE r13 — a nested record without its own namespace
    attribute lives in its enclosing type's namespace). Returns the
    namespace the type's CHILDREN inherit. The short name also registers
    (setdefault — first definition wins) so unqualified references keep
    resolving."""
    name = schema.get("name")
    if not name:
        return ns
    if "." in name:
        namespace = name.rsplit(".", 1)[0]
        full = name
    else:
        namespace = schema.get("namespace", ns)
        full = f"{namespace}.{name}" if namespace else name
    names.setdefault(full, schema)
    names.setdefault(name, schema)
    return namespace


def _collect_names(schema, names: dict, ns: str | None = None) -> None:
    """Pre-register every named type so forward-order references resolve
    regardless of which record appears first in a datum, threading the
    enclosing namespace so nested named types register under their
    inherited fullname."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names, ns)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        ns = _register_name(schema, names, ns)
    if t == "record":
        for f in schema.get("fields", []):
            _collect_names(f.get("type"), names, ns)
    elif t == "array":
        _collect_names(schema.get("items"), names, ns)
    elif t == "map":
        _collect_names(schema.get("values"), names, ns)
    elif isinstance(t, (dict, list)):
        _collect_names(t, names, ns)


def _zigzag(n: int) -> bytes:
    """Avro int/long wire form: zigzag then LEB128 varint."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_len_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def encode_datum(schema, value, names: dict | None = None, ns: str | None = None) -> bytes:
    """Binary-encode one datum under the writer's ``schema`` — the exact
    inverse of _decode, sharing its name registry and namespace
    inheritance. Exists so OPERATORS can synthesize genuine Iceberg
    manifest fixtures (the same reason gifcodec has an encoder); the
    decode path stays the operator surface under test, and the test
    suite cross-checks this encoder against an independently written one
    (tests/test_avro_codec.py)."""
    if names is None:
        names = {}
        _collect_names(schema, names)
    if isinstance(schema, list):  # union: first branch accepting the value
        # spec: unions may not immediately contain other unions. Scan ALL
        # branches BEFORE matching (ADVICE r16): an in-loop check only
        # fires when iteration reaches the list branch, so an illegal
        # schema like ['null', ['int','string']] would silently encode
        # None via branch 0 instead of being rejected — asymmetric with
        # the decode side, which refuses the schema outright.
        for i, branch in enumerate(schema):
            if isinstance(branch, list):
                raise AvroError(
                    f"union branch {i} is itself a union: illegal Avro schema"
                )
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zigzag(i)
            if value is not None and bt != "null":
                return _zigzag(i) + encode_datum(branch, value, names, ns)
        raise AvroError(f"no union branch in {schema!r} accepts {value!r}")
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if value else b"\x00"
        if t in ("int", "long"):
            return _zigzag(int(value))
        if t == "float":
            return struct.pack("<f", value)
        if t == "double":
            return struct.pack("<d", value)
        if t == "bytes":
            return _enc_len_bytes(bytes(value))
        if t == "string":
            return _enc_len_bytes(value.encode("utf-8"))
        if ns and f"{ns}.{t}" in names:
            return encode_datum(names[f"{ns}.{t}"], value, names, ns)
        if t in names:
            return encode_datum(names[t], value, names, ns)
        raise AvroError(f"unknown Avro type {t!r}")
    if not isinstance(schema, dict):
        raise AvroError(f"malformed schema node {schema!r}")
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return encode_datum(t, value, names, ns)
    if t == "record":
        ns = _register_name(schema, names, ns)
        return b"".join(
            encode_datum(f["type"], value[f["name"]], names, ns)
            for f in schema["fields"]
        )
    if t == "enum":
        _register_name(schema, names, ns)
        return _zigzag(schema["symbols"].index(value))
    if t == "array":
        if not value:
            return _zigzag(0)
        body = b"".join(encode_datum(schema["items"], v, names, ns) for v in value)
        return _zigzag(len(value)) + body + _zigzag(0)
    if t == "map":
        if not value:
            return _zigzag(0)
        body = b"".join(
            _enc_len_bytes(k.encode("utf-8"))
            + encode_datum(schema["values"], v, names, ns)
            for k, v in value.items()
        )
        return _zigzag(len(value)) + body + _zigzag(0)
    if t == "fixed":
        _register_name(schema, names, ns)
        if len(value) != schema["size"]:
            raise AvroError(
                f"fixed {schema.get('name')} wants {schema['size']} bytes, "
                f"got {len(value)}"
            )
        return bytes(value)
    return encode_datum(t, value, names, ns)


_WRITER_SYNC = b"xtps-avro-sync16"  # deterministic fixtures, byte-stable


def write_container(path: str, schema, records, codec: str = "null") -> None:
    """Write one Avro object container file (codec null or deflate) —
    the writer half backing fixture synthesis; read_container is its
    verified inverse."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"codec {codec!r} not supported by this writer")
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out = bytearray(_MAGIC)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        out += _enc_len_bytes(k.encode("utf-8")) + _enc_len_bytes(v)
    out += _zigzag(0)
    out += _WRITER_SYNC
    if records:
        names: dict = {}
        _collect_names(schema, names)
        body = b"".join(encode_datum(schema, r, names) for r in records)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            body = comp.compress(body) + comp.flush()
        out += _zigzag(len(records)) + _enc_len_bytes(body) + _WRITER_SYNC
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def read_container(data: bytes) -> tuple[dict, list]:
    """(writer schema as parsed JSON, decoded records) from one Avro
    object container file. Sync markers are VERIFIED per block — a
    mismatch is a torn or corrupt file and refuses, never truncates
    silently. Codecs: null, deflate (raw zlib per the spec)."""
    cur = _Cursor(data)
    if cur.take(4) != _MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while (count := cur.read_long()) != 0:
        if count < 0:
            count = -count
            cur.read_long()
        for _ in range(count):
            key = cur.read_bytes().decode("utf-8")
            meta[key] = cur.read_bytes()
    sync = cur.take(16)
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroError("container file carries no avro.schema") from None
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(
            f"Avro codec {codec!r} is not served (null and deflate are); "
            "refusing rather than returning garbage"
        )
    names: dict = {}
    _collect_names(schema, names)
    rec_min = _min_datum_bytes(schema, names)
    records: list = []
    # Cumulative zero-byte-datum budget across the WHOLE file: a per-block
    # cap alone still lets a small crafted file chain many sub-cap
    # zero-byte-record blocks into hundreds of millions of materialized
    # dicts (ADVICE r16). The running total is threaded through each
    # block's cursor so zero-byte ARRAY/MAP items accumulate across
    # blocks under the same budget.
    zero_total = 0
    while not cur.at_end():
        n_records = cur.read_long()
        block = cur.read_bytes()
        if cur.take(16) != sync:
            raise AvroError(
                "sync marker mismatch mid-file: torn or corrupt container"
            )
        if codec == "deflate":
            try:
                block = zlib.decompress(block, wbits=-15)
            except zlib.error as exc:
                raise AvroError(f"corrupt deflate block: {exc}") from exc
        # The remaining-bytes bound only applies when a record provably
        # consumes >=1 byte; zero-byte-encodable record schemas (all-null
        # fields — spec-legal, ADVICE r14) get the sanity cap instead —
        # applied to the RUNNING file total, not just this block.
        if rec_min < 1:
            zero_total += max(n_records, 0)
        if n_records < 0 or (
            n_records > len(block) + 1
            if rec_min >= 1
            else zero_total > _ZERO_BYTE_COUNT_CAP
        ):
            raise AvroError(
                f"block declares {n_records} records in {len(block)} "
                "bytes: corrupt block"
            )
        bcur = _Cursor(block)
        bcur.zero_byte_items = zero_total
        for _ in range(n_records):
            records.append(_decode(schema, bcur, names))
        zero_total = bcur.zero_byte_items
        if not bcur.at_end():
            raise AvroError(
                f"block declared {n_records} records but "
                f"{len(block) - bcur.pos} bytes remain"
            )
    return schema, records


def read_container_file(path: str) -> tuple[dict, list]:
    """read_container over a file, naming the FILE in any decode error —
    a bare "truncated Avro data: wanted N bytes at P" is a
    needle-in-haystack message when a snapshot read walks dozens of
    manifests (r16, same provenance rule as the Delta torn-commit
    guard)."""
    with open(path, "rb") as fh:
        data = fh.read()
    try:
        return read_container(data)
    except AvroError as e:
        raise AvroError(f"{os.path.basename(path)}: {e}") from e
