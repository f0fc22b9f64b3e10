"""Decode-only Avro reader — genuine format bytes.

The encoder here is written from the Avro 1.11 spec independently of
the decoder under test, and the base cases are additionally pinned as
hand-written byte literals (varints, a whole container file) so a
symmetric encode/decode misreading cannot hide.
"""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from xml_to_parquet_spark.sources.avro_codec import (
    AvroError,
    _Cursor,
    read_container,
)

# ---------------------------------------------------------------------------
# spec-derived encoder (reused by the Iceberg fixtures)
# ---------------------------------------------------------------------------


def zz(n: int) -> bytes:
    """Zigzag varint (Avro int/long encoding)."""
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


def _enc_bytes(b: bytes) -> bytes:
    return zz(len(b)) + b


def encode_datum(schema, value, names=None) -> bytes:
    names = names if names is not None else {}
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return zz(i)
            if value is not None and bt != "null":
                return zz(i) + encode_datum(branch, value, names)
        raise ValueError(f"no union branch for {value!r}")
    if isinstance(schema, str):
        t = names.get(schema, schema)
        if isinstance(t, dict):
            return encode_datum(t, value, names)
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if value else b"\x00"
        if t in ("int", "long"):
            return zz(value)
        if t == "float":
            return struct.pack("<f", value)
        if t == "double":
            return struct.pack("<d", value)
        if t == "bytes":
            return _enc_bytes(value)
        if t == "string":
            return _enc_bytes(value.encode("utf-8"))
        raise ValueError(f"unknown type {t}")
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        return b"".join(
            encode_datum(f["type"], value[f["name"]], names)
            for f in schema["fields"]
        )
    if t == "enum":
        return zz(schema["symbols"].index(value))
    if t == "array":
        if not value:
            return zz(0)
        body = b"".join(encode_datum(schema["items"], v, names) for v in value)
        return zz(len(value)) + body + zz(0)
    if t == "map":
        if not value:
            return zz(0)
        body = b"".join(
            _enc_bytes(k.encode("utf-8")) + encode_datum(schema["values"], v, names)
            for k, v in value.items()
        )
        return zz(len(value)) + body + zz(0)
    if t == "fixed":
        assert len(value) == schema["size"]
        return value
    return encode_datum(t, value, names)


SYNC = b"0123456789abcdef"


def encode_container(schema, records, codec="null", sync=SYNC) -> bytes:
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = bytearray(b"Obj\x01")
    out += zz(len(meta))
    for k, v in meta.items():
        out += _enc_bytes(k.encode()) + _enc_bytes(v)
    out += zz(0)
    out += sync
    if records:
        names: dict = {}
        body = b"".join(encode_datum(schema, r, names) for r in records)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            body = comp.compress(body) + comp.flush()
        out += zz(len(records)) + _enc_bytes(body) + sync
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder-only goldens
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw, expected",
    [
        (b"\x00", 0),
        (b"\x01", -1),
        (b"\x02", 1),
        (b"\x03", -2),
        (b"\x04", 2),
        (b"\x80\x01", 64),
        (b"\x81\x01", -65),
        (b"\xfe\xff\xff\xff\x0f", (1 << 31) - 1),
    ],
)
def test_golden_zigzag_varints(raw, expected):
    assert _Cursor(raw).read_long() == expected


def test_golden_container_bytes():
    """A whole container file written out by hand: record {a: long,
    b: string}, codec null, one block of two records."""
    schema = (b'{"type":"record","name":"R","fields":[{"name":"a",'
              b'"type":"long"},{"name":"b","type":"string"}]}')
    data = (
        b"Obj\x01"
        + b"\x04"                                  # 2 metadata entries
        + b"\x16avro.schema" + zz(len(schema)) + schema
        + b"\x14avro.codec" + b"\x08null"
        + b"\x00"                                  # end of metadata map
        + SYNC
        + b"\x04"                                  # 2 records in the block
        + b"\x10"                                  # block byte length 8
        + b"\x02" + b"\x04hi"                      # (1, "hi")
        + b"\x03" + b"\x04yo"                      # (-2, "yo")
        + SYNC
    )
    got_schema, records = read_container(data)
    assert got_schema["name"] == "R"
    assert records == [{"a": 1, "b": "hi"}, {"a": -2, "b": "yo"}]


# ---------------------------------------------------------------------------
# round-trips across the type system
# ---------------------------------------------------------------------------

_FULL_SCHEMA = {
    "type": "record",
    "name": "everything",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "color",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 8}},
        {"name": "nested", "type": {
            "type": "record", "name": "inner",
            "fields": [{"name": "x", "type": "long"}]}},
        {"name": "again", "type": "inner"},  # named-type reference
    ],
}


def _sample(i):
    return {
        "b": i % 2 == 0,
        "i": -i,
        "l": i * 123456789,
        "f": 1.5,
        "d": i / 7.0,
        "s": f"row-{i}",
        "by": bytes([i % 256, 255]),
        "opt": None if i % 3 == 0 else i,
        "arr": list(range(i % 5)),
        "m": {f"k{j}": f"v{j}" for j in range(i % 4)},
        "e": ["RED", "GREEN", "BLUE"][i % 3],
        "fx": bytes(range(8)),
        "nested": {"x": i},
        "again": {"x": -i},
    }


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    records = [_sample(i) for i in range(20)]
    _, got = read_container(encode_container(_FULL_SCHEMA, records, codec))
    for want, have in zip(records, got):
        for k, v in want.items():
            if k == "f":
                assert abs(have[k] - v) < 1e-6
            else:
                assert have[k] == v, k


def test_empty_container():
    _, got = read_container(encode_container(_FULL_SCHEMA, []))
    assert got == []


# ---------------------------------------------------------------------------
# refusals
# ---------------------------------------------------------------------------


def test_bad_magic_refused():
    with pytest.raises(AvroError, match="magic"):
        read_container(b"NOPE" + b"\x00" * 40)


def test_sync_mismatch_refused():
    data = bytearray(encode_container(_FULL_SCHEMA, [_sample(1)]))
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(AvroError, match="sync marker"):
        read_container(bytes(data))


def test_unknown_codec_refused():
    data = encode_container(_FULL_SCHEMA, [], codec="snappy")
    with pytest.raises(AvroError, match="snappy"):
        read_container(data)


def test_truncated_refused():
    data = encode_container(_FULL_SCHEMA, [_sample(1)])
    with pytest.raises(AvroError):
        read_container(data[: len(data) - 20])


# ---------------------------------------------------------------------------
# property: arbitrary values survive the container round-trip
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VALUE = st.fixed_dictionaries(
    {
        "b": st.booleans(),
        "i": st.integers(-(2**31), 2**31 - 1),
        "l": st.integers(-(2**63), 2**63 - 1),
        "f": st.just(0.5),
        "d": st.floats(allow_nan=False, allow_infinity=False),
        "s": st.text(max_size=40),
        "by": st.binary(max_size=40),
        "opt": st.none() | st.integers(-(2**63), 2**63 - 1),
        "arr": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
        "m": st.dictionaries(st.text(min_size=1, max_size=8),
                             st.text(max_size=8), max_size=6),
        "e": st.sampled_from(["RED", "GREEN", "BLUE"]),
        "fx": st.just(bytes(8)),
        "nested": st.fixed_dictionaries(
            {"x": st.integers(-(2**63), 2**63 - 1)}),
        "again": st.fixed_dictionaries(
            {"x": st.integers(-(2**63), 2**63 - 1)}),
    }
)


@settings(max_examples=60, deadline=None)
@given(records=st.lists(_VALUE, max_size=5),
       codec=st.sampled_from(["null", "deflate"]))
def test_property_roundtrip(records, codec):
    _, got = read_container(encode_container(_FULL_SCHEMA, records, codec))
    assert got == records


@settings(max_examples=60, deadline=None)
@given(records=st.lists(_VALUE, max_size=5),
       codec=st.sampled_from(["null", "deflate"]))
def test_property_roundtrip_package_encoder(tmp_path_factory, records, codec):
    """The PACKAGE's own encode path (r14, avro_codec.write_container —
    the one operators use to synthesize manifest fixtures) round-trips
    through the decoder over the full type system, and its bytes decode
    identically to the independent test-side encoder's."""
    import os

    from xml_to_parquet_spark.sources.avro_codec import (
        read_container_file,
        write_container,
    )

    d = tmp_path_factory.mktemp("avroenc")
    p = os.path.join(str(d), "t.avro")
    write_container(p, _FULL_SCHEMA, records, codec)
    _, got = read_container_file(p)
    assert got == records
    # cross-validation: both encoders' bytes decode to the same records
    _, got2 = read_container(encode_container(_FULL_SCHEMA, records, codec))
    assert got2 == got


def test_package_encoder_refuses_unknown_codec(tmp_path):
    from xml_to_parquet_spark.sources.avro_codec import write_container

    with pytest.raises(AvroError, match="snappy"):
        write_container(str(tmp_path / "x.avro"), "long", [1], codec="snappy")


@settings(max_examples=400, deadline=None)
@given(off=st.integers(min_value=0, max_value=10**6),
       flip=st.integers(min_value=1, max_value=255),
       codec=st.sampled_from(["null", "deflate"]))
def test_corrupt_container_bytes_never_crash(off, flip, codec):
    """Failure contract mirroring the image/audio codec fuzz suites
    (the r13 GIF finding's lesson): flipping any single byte of a
    container — header, embedded schema JSON, block counts, payload,
    sync — must either raise ValueError (AvroError and friends) or
    decode to SOMETHING, never KeyError / zlib.error / IndexError /
    a hang from a forged 2^40 block count."""
    good = encode_container(_FULL_SCHEMA, [_sample(i) for i in range(3)], codec)
    off %= len(good)
    bad = good[:off] + bytes([good[off] ^ flip]) + good[off + 1 :]
    try:
        read_container(bad)
    except ValueError:
        pass


def test_forged_block_counts_refused():
    """Hand-built corruptions the random fuzz may not land on: a huge
    array block count inside a datum, and a huge record count on the
    container block — both provably exceed the remaining bytes."""
    good = encode_container(
        {"type": "record", "name": "r",
         "fields": [{"name": "a",
                     "type": {"type": "array", "items": "long"}}]},
        [{"a": [1, 2, 3]}],
    )
    # the container path: patch n_records (first varint after the sync)
    hdr_end = good.index(SYNC) + 16
    forged = good[:hdr_end] + zz(2**40) + good[hdr_end + len(zz(1)):]
    with pytest.raises(AvroError):
        read_container(forged)
