"""Deletion vectors in the Delta log adapter — genuine protocol bytes.

Every fixture below is hand-assembled from the PUBLIC specs (delta-io
PROTOCOL.md "Deletion Vectors" + github.com/RoaringBitmap/
RoaringFormatSpec + ZeroMQ RFC 32 for Z85), so the adapter is exercised
against the real on-disk layouts, not against its own writer. The
decoder-only golden tests pin literal byte strings computed by hand —
they would catch a symmetric encode/decode bug the round-trip tests
cannot see.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml_to_parquet_spark.sources import delta_dv
from xml_to_parquet_spark.sources.delta_log import (
    delta_active_files,
    delta_incremental_files,
    read_delta_snapshot,
)

# ---------------------------------------------------------------------------
# spec-derived encoders (test-side only; the module under test only decodes)
# ---------------------------------------------------------------------------

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def _z85_encode(data: bytes) -> str:
    data = data + b"\x00" * ((-len(data)) % 4)
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        block = []
        for _ in range(5):
            block.append(_Z85[v % 85])
            v //= 85
        out.append("".join(reversed(block)))
    return "".join(out)


def _serialize_roaring32(positions, run_keys=frozenset()) -> bytes:
    """One 32-bit roaring bitmap per RoaringFormatSpec. Containers whose
    high-16 key is in ``run_keys`` use the run codec (value, extra
    pairs); others use array (card <= 4096) or bitmap containers."""
    by_key: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        by_key.setdefault(p >> 16, []).append(p & 0xFFFF)
    keys = sorted(by_key)
    size = len(keys)
    has_runs = bool(run_keys)
    body = b""
    offsets: list[int] = []
    if has_runs:
        run_bitset = bytearray((size + 7) // 8)
        for i, k in enumerate(keys):
            if k in run_keys:
                run_bitset[i // 8] |= 1 << (i % 8)
        header = struct.pack(
            "<I", (12347 | ((size - 1) << 16)) & 0xFFFFFFFF
        ) + bytes(run_bitset)
    else:
        header = struct.pack("<II", 12346, size)
    descr = b"".join(
        struct.pack("<HH", k, len(by_key[k]) - 1) for k in keys
    )
    with_offsets = (not has_runs) or size >= 4
    container_start = len(header) + len(descr) + (4 * size if with_offsets else 0)
    for k in keys:
        vals = by_key[k]
        offsets.append(container_start + len(body))
        if k in run_keys:
            runs = []
            start = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                else:
                    runs.append((start, prev - start))
                    start = prev = v
            runs.append((start, prev - start))
            body += struct.pack("<H", len(runs))
            body += b"".join(struct.pack("<HH", s, e) for s, e in runs)
        elif len(vals) <= 4096:
            body += b"".join(struct.pack("<H", v) for v in vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v // 8] |= 1 << (v % 8)
            body += bytes(bits)
    offset_hdr = (
        b"".join(struct.pack("<I", o) for o in offsets) if with_offsets else b""
    )
    return header + descr + offset_hdr + body


def _serialize_treemap(positions, run_keys=frozenset()) -> bytes:
    """RoaringBitmapArray 'portable': Delta magic, u64 bitmap count, then
    (u32 high-key, 32-bit roaring) pairs (PROTOCOL.md DV format)."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(int(x) for x in positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = struct.pack("<iq", 1681511377, len(by_high))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(by_high[high], run_keys)
    return out


def _write_dv_file(path, blobs, pad=0):
    """On-disk DV file (PROTOCOL.md file storage format): version byte 1,
    then per DV a big-endian length, the bytes, and a big-endian CRC-32.
    Returns each blob's offset (pointing at its length field)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    offsets = []
    with open(path, "wb") as fh:
        fh.write(b"\x01" + b"\x00" * pad)
        for blob in blobs:
            offsets.append(fh.tell())
            fh.write(struct.pack(">i", len(blob)))
            fh.write(blob)
            fh.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return offsets


# ---------------------------------------------------------------------------
# decoder-only goldens (hand-assembled literals; no test encoder involved)
# ---------------------------------------------------------------------------


def test_golden_array_containers_decode():
    """{0, 5, 131072}: two array containers (key 0 card 2, key 2 card 1)
    under the no-run cookie, every byte written out by hand."""
    bitmap32 = bytes(
        [
            0x3A, 0x30, 0x00, 0x00,  # cookie 12346 LE
            0x02, 0x00, 0x00, 0x00,  # 2 containers
            0x00, 0x00, 0x01, 0x00,  # key 0, cardinality-1 = 1
            0x02, 0x00, 0x00, 0x00,  # key 2, cardinality-1 = 0
            0x18, 0x00, 0x00, 0x00,  # offset of container 0 = 24
            0x1C, 0x00, 0x00, 0x00,  # offset of container 1 = 28
            0x00, 0x00, 0x05, 0x00,  # container 0: values 0, 5
            0x00, 0x00,              # container 1: value 0
        ]
    )
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<I", 0) + bitmap32
    assert delta_dv.decode_dv_positions(data).tolist() == [0, 5, 131072]


def test_golden_run_container_decode():
    """{10..14, 20}: one run container under the run cookie — size 1, so
    the run bitset is a single byte and the offset header is OMITTED
    (NO_OFFSET_THRESHOLD), per RoaringFormatSpec."""
    bitmap32 = bytes(
        [
            0x3B, 0x30, 0x00, 0x00,  # cookie 12347 | (size-1=0)<<16
            0x01,                    # run bitset: container 0 is a run
            0x00, 0x00, 0x05, 0x00,  # key 0, cardinality-1 = 5
            0x02, 0x00,              # 2 runs
            0x0A, 0x00, 0x04, 0x00,  # run 10 length+0..4 -> 10..14
            0x14, 0x00, 0x00, 0x00,  # run 20..20
        ]
    )
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<I", 0) + bitmap32
    assert delta_dv.decode_dv_positions(data).tolist() == [10, 11, 12, 13, 14, 20]


def test_golden_bitmap_container_decode():
    """A dense container (cardinality 4097 > 4096) as an 8192-byte
    bitset, assembled bit-by-bit here — independent of the test encoder."""
    vals = list(range(4097))
    bits = bytearray(8192)
    for v in vals:
        bits[v // 8] |= 1 << (v % 8)
    bitmap32 = (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 4096)  # key 0, cardinality-1
        + struct.pack("<I", 16)        # container offset
        + bytes(bits)
    )
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<I", 0) + bitmap32
    assert delta_dv.decode_dv_positions(data).tolist() == vals


def test_golden_z85_hello_world():
    """The canonical ZeroMQ RFC 32 test vector."""
    assert delta_dv.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


# ---------------------------------------------------------------------------
# round-trips across container codecs and high-key buckets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "positions, run_keys",
    [
        ([0, 1, 2, 65535], frozenset()),
        (list(range(100, 10000)), frozenset()),  # dense -> bitmap container
        (list(range(50, 70)) + [300], frozenset({0})),  # run container
        ([1, 65536 + 7, 3 * 65536 + 9, 5 * 65536], frozenset()),  # many keys
        # >= 4 containers in run format exercises the offset header skip
        ([j * 65536 + i for j in range(5) for i in (2, 3, 4)], frozenset({1, 3})),
        ([5, (1 << 32) + 17, (7 << 32) + 123456], frozenset()),  # high buckets
        ([], frozenset()),
    ],
)
def test_treemap_roundtrip(positions, run_keys):
    data = _serialize_treemap(positions, run_keys)
    got = delta_dv.decode_dv_positions(data)
    assert got.tolist() == sorted(set(positions))
    assert got.dtype == np.int64


def test_bad_magic_refused():
    with pytest.raises(ValueError, match="magic"):
        delta_dv.decode_dv_positions(struct.pack("<iq", 99, 0))


# property: arbitrary position sets survive serialize -> decode, across
# container-codec boundaries (sparse arrays, dense bitmaps, runs)
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    positions=st.lists(
        st.integers(0, (1 << 34) - 1), max_size=300, unique=True
    ),
    dense_block=st.booleans(),
)
def test_property_treemap_roundtrip(positions, dense_block):
    if dense_block:
        # force one >4096-cardinality container (the bitmap codec)
        positions = sorted(set(positions) | set(range(70000, 75000)))
    got = delta_dv.decode_dv_positions(_serialize_treemap(positions))
    assert got.tolist() == sorted(set(positions))


# ---------------------------------------------------------------------------
# descriptor loading: files, offsets, CRC, inline, Z85 paths
# ---------------------------------------------------------------------------

_UUID = uuid.UUID(int=0x0123456789ABCDEF0123456789ABCDEF)


def _u_descriptor(blob, offset, prefix=""):
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + _z85_encode(_UUID.bytes),
        "offset": offset,
        "sizeInBytes": len(blob),
        "cardinality": None,  # caller fills
    }


def test_uuid_path_derivation(tmp_path):
    blob = _serialize_treemap([1, 2, 3])
    path = os.path.join(str(tmp_path), "ab", f"deletion_vector_{_UUID}.bin")
    offsets = _write_dv_file(path, [blob])
    desc = _u_descriptor(blob, offsets[0], prefix="ab/")
    assert delta_dv.dv_file_path(desc, str(tmp_path)) == path
    assert delta_dv.load_dv_bytes(desc, str(tmp_path)) == blob


def test_two_dvs_one_file_by_offset(tmp_path):
    """Real writers pack many DVs per .bin; the offset selects one."""
    b1, b2 = _serialize_treemap([1]), _serialize_treemap([2, 9])
    path = os.path.join(str(tmp_path), f"deletion_vector_{_UUID}.bin")
    off1, off2 = _write_dv_file(path, [b1, b2], pad=7)
    assert delta_dv.load_dv_bytes(_u_descriptor(b1, off1), str(tmp_path)) == b1
    assert delta_dv.load_dv_bytes(_u_descriptor(b2, off2), str(tmp_path)) == b2


def test_crc_corruption_refused(tmp_path):
    blob = _serialize_treemap([1, 2, 3])
    path = os.path.join(str(tmp_path), f"deletion_vector_{_UUID}.bin")
    (off,) = _write_dv_file(path, [blob])
    with open(path, "r+b") as fh:
        fh.seek(off + 4 + 2)
        fh.write(b"\xFF")
    with pytest.raises(ValueError, match="CRC-32"):
        delta_dv.load_dv_bytes(_u_descriptor(blob, off), str(tmp_path))


def test_size_mismatch_refused(tmp_path):
    blob = _serialize_treemap([1])
    path = os.path.join(str(tmp_path), f"deletion_vector_{_UUID}.bin")
    (off,) = _write_dv_file(path, [blob])
    desc = _u_descriptor(blob, off)
    desc["sizeInBytes"] = len(blob) + 1
    with pytest.raises(ValueError, match="descriptor says"):
        delta_dv.load_dv_bytes(desc, str(tmp_path))


def test_bad_format_version_refused(tmp_path):
    blob = _serialize_treemap([1])
    path = os.path.join(str(tmp_path), f"deletion_vector_{_UUID}.bin")
    (off,) = _write_dv_file(path, [blob])
    with open(path, "r+b") as fh:
        fh.write(b"\x02")
    with pytest.raises(ValueError, match="format version"):
        delta_dv.load_dv_bytes(_u_descriptor(blob, off), str(tmp_path))


def test_inline_descriptor_roundtrip():
    blob = _serialize_treemap([4, 5, 6, 100000])
    desc = {
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(blob),
        "sizeInBytes": len(blob),
        "cardinality": 4,
    }
    assert delta_dv.load_dv_bytes(desc, "/nowhere") == blob


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError, match="multiple of 5"):
        delta_dv.z85_decode("abc")
    with pytest.raises(ValueError, match="alphabet"):
        delta_dv.z85_decode('abcd"')


# ---------------------------------------------------------------------------
# end-to-end through the log adapter and Spark
# ---------------------------------------------------------------------------


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


_SCHEMA_K = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
)

_DV_PROTOCOL = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}

_D0_DELETED = [3, 17] + list(range(50, 60))  # row index == k for d0


@pytest.fixture(scope="module")
def dv_table(tmp_path_factory):
    """d0 holds k=0..99 (row index == k), d1 holds k=100..199 (row index
    == k-100). Commit 1 is the real DELETE shape (remove + re-add d0
    with an on-disk 'u' DV); commit 2 deletes {100, 199} from d1 via an
    inline DV."""
    table = str(tmp_path_factory.mktemp("dv_table"))
    pq.write_table(
        pa.table({"k": list(range(100))}), os.path.join(table, "d0.parquet")
    )
    pq.write_table(
        pa.table({"k": list(range(100, 200))}), os.path.join(table, "d1.parquet")
    )
    blob0 = _serialize_treemap(_D0_DELETED, run_keys=frozenset({0}))
    (off0,) = _write_dv_file(
        os.path.join(table, f"deletion_vector_{_UUID}.bin"), [blob0]
    )
    _commit(table, 0, [
        _DV_PROTOCOL,
        {"metaData": {"id": "dv-fixture", "format": {"provider": "parquet"},
                      "schemaString": _SCHEMA_K, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": "d0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    _commit(table, 1, [
        {"remove": {"path": "d0.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": {"path": "d0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": _z85_encode(_UUID.bytes),
                     "offset": off0,
                     "sizeInBytes": len(blob0),
                     "cardinality": len(_D0_DELETED),
                 }}},
    ])
    blob1 = _serialize_treemap([0, 99])  # row indexes within d1
    _commit(table, 2, [
        {"remove": {"path": "d1.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "i",
                     "pathOrInlineDv": _z85_encode(blob1),
                     "sizeInBytes": len(blob1),
                     "cardinality": 2,
                 }}},
    ])
    return table


def _keys(df):
    return {r["k"] for r in df.select("k").collect()}


def test_dv_snapshot_reads(spark, dv_table):
    all_k = set(range(200))
    assert _keys(read_delta_snapshot(spark, dv_table, 0)) == all_k
    assert _keys(read_delta_snapshot(spark, dv_table, 1)) == all_k - set(
        _D0_DELETED
    )
    assert _keys(read_delta_snapshot(spark, dv_table, 2)) == (
        all_k - set(_D0_DELETED) - {100, 199}
    )


def test_dv_result_has_no_helper_columns(spark, dv_table):
    assert read_delta_snapshot(spark, dv_table, 2).columns == ["k"]


def test_dv_incremental_window_refused(dv_table):
    with pytest.raises(ValueError, match="delete"):
        delta_incremental_files(dv_table, 0, 2)


def test_dv_from_checkpoint_seed(spark, dv_table, tmp_path):
    """A checkpointed add row carries its deletionVector struct; with the
    JSON commits cleaned, the DV must still apply from the seed."""
    import shutil

    from xml_to_parquet_spark.sources.delta_log import _replay

    table = str(tmp_path / "cp")
    shutil.copytree(dv_table, table)
    active, _ = _replay(table, 2)
    rows = [
        {"add": {"path": p, "size": 1, "dataChange": True,
                 "deletionVector": e["deletionVector"]},
         "metaData": None, "protocol": None}
        for p, e in active.items()
    ]
    # configuration omitted: pyarrow cannot write an EMPTY struct column,
    # and the reader treats a missing configuration as the default
    rows.append({"add": None,
                 "metaData": {"id": "dv-fixture",
                              "format": {"provider": "parquet"},
                              "schemaString": _SCHEMA_K,
                              "partitionColumns": []},
                 "protocol": None})
    rows.append({"add": None, "metaData": None,
                 "protocol": _DV_PROTOCOL["protocol"]})
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(table, "_delta_log", "00000000000000000002.checkpoint.parquet"),
    )
    for v in (0, 1, 2):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    got = _keys(read_delta_snapshot(spark, table, 2))
    assert got == set(range(200)) - set(_D0_DELETED) - {100, 199}


def test_dv_zero_cardinality_descriptor_is_noop(spark, tmp_path):
    table = str(tmp_path / "nodel")
    os.makedirs(table)
    pq.write_table(pa.table({"k": [1, 2]}), os.path.join(table, "f.parquet"))
    _commit(table, 0, [
        _DV_PROTOCOL,
        {"metaData": {"id": "x", "format": {"provider": "parquet"},
                      "schemaString": _SCHEMA_K, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {"storageType": "i",
                                    "pathOrInlineDv": _z85_encode(
                                        _serialize_treemap([])),
                                    "sizeInBytes": len(_serialize_treemap([])),
                                    "cardinality": 0}}},
    ])
    assert _keys(read_delta_snapshot(spark, table)) == {1, 2}


def test_dv_on_partitioned_table(spark, tmp_path):
    """DV + log-borne partition values compose: the deleted rows vanish
    and the surviving rows still carry their partition literal."""
    table = str(tmp_path / "part")
    os.makedirs(os.path.join(table, "p=a"))
    os.makedirs(os.path.join(table, "p=b"))
    pq.write_table(pa.table({"k": [0, 1, 2, 3]}),
                   os.path.join(table, "p=a", "f0.parquet"))
    pq.write_table(pa.table({"k": [10, 11]}),
                   os.path.join(table, "p=b", "f1.parquet"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {}},
    ]})
    blob = _serialize_treemap([1, 3])
    _commit(table, 0, [
        _DV_PROTOCOL,
        {"metaData": {"id": "x", "format": {"provider": "parquet"},
                      "schemaString": schema, "partitionColumns": ["p"],
                      "configuration": {}}},
        {"add": {"path": "p=a/f0.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": {"storageType": "i",
                                    "pathOrInlineDv": _z85_encode(blob),
                                    "sizeInBytes": len(blob),
                                    "cardinality": 2}}},
        {"add": {"path": "p=b/f1.parquet", "partitionValues": {"p": "b"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = {(r["k"], r["p"])
           for r in read_delta_snapshot(spark, table).collect()}
    assert got == {(0, "a"), (2, "a"), (10, "b"), (11, "b")}
    only_a = {(r["k"], r["p"])
              for r in read_delta_snapshot(
                  spark, table, partition_filter={"p": "a"}).collect()}
    assert only_a == {(0, "a"), (2, "a")}


def test_dv_unsafe_path_refused(spark, tmp_path):
    """A DV'd data file whose path would percent-escape in the
    _metadata URI cannot be joined soundly — the read must refuse, not
    silently resurrect deleted rows."""
    table = str(tmp_path / "weird")
    os.makedirs(os.path.join(table, "we ird"))
    pq.write_table(pa.table({"k": [1, 2]}),
                   os.path.join(table, "we ird", "f.parquet"))
    blob = _serialize_treemap([0])
    _commit(table, 0, [
        _DV_PROTOCOL,
        {"metaData": {"id": "x", "format": {"provider": "parquet"},
                      "schemaString": _SCHEMA_K, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": "we ird/f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {"storageType": "i",
                                    "pathOrInlineDv": _z85_encode(blob),
                                    "sizeInBytes": len(blob),
                                    "cardinality": 1}}},
    ])
    with pytest.raises(ValueError, match="percent-escape"):
        read_delta_snapshot(spark, table).collect()


# ---------------------------------------------------------------------------
# protocol gating
# ---------------------------------------------------------------------------


def _one_file_table(tmp_path, protocol):
    table = str(tmp_path)
    pq.write_table(pa.table({"k": [1]}), os.path.join(table, "f.parquet"))
    _commit(table, 0, [
        {"protocol": protocol},
        {"metaData": {"id": "x", "format": {"provider": "parquet"},
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    return table


def test_unknown_reader_feature_refused(tmp_path):
    table = _one_file_table(tmp_path, {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "someFutureFeature"],
    })
    with pytest.raises(ValueError, match="someFutureFeature"):
        delta_active_files(table)


def test_future_reader_version_refused(tmp_path):
    table = _one_file_table(tmp_path, {
        "minReaderVersion": 4, "minWriterVersion": 8,
    })
    with pytest.raises(ValueError, match="minReaderVersion 4"):
        delta_active_files(table)


def test_supported_feature_set_reads(tmp_path):
    table = _one_file_table(tmp_path, {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "timestampNtz",
                           "vacuumProtocolCheck"],
    })
    assert delta_active_files(table) == [os.path.join(table, "f.parquet")]


def test_protocol_upgrade_in_incremental_window_refused(tmp_path):
    table = _one_file_table(tmp_path, {
        "minReaderVersion": 1, "minWriterVersion": 2,
    })
    _commit(table, 1, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["someFutureFeature"]}},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="someFutureFeature"):
        delta_incremental_files(table, 0, 1)


@settings(max_examples=400, deadline=None)
@given(off=st.integers(min_value=0, max_value=10**6),
       flip=st.integers(min_value=1, max_value=255),
       dense=st.booleans())
def test_dv_corrupt_bytes_never_crash(off, flip, dense):
    """Failure contract mirroring the codec fuzz suites (the r13 GIF
    lesson): flipping any byte of a serialized RoaringBitmapArray must
    either raise ValueError or decode to SOME position array — never
    struct.error/IndexError (truncated reads are bounds-checked by
    _unpack) or a crash from a forged container count."""
    base = {1, 5, 17, 300, 70000, 70001, 2**33, 2**33 + 65537}
    run_keys = frozenset({0}) if dense else frozenset()
    good = _serialize_treemap(sorted(base), run_keys=run_keys)
    off %= len(good)
    bad = good[:off] + bytes([good[off] ^ flip]) + good[off + 1 :]
    try:
        out = delta_dv.decode_dv_positions(bad)
    except ValueError:
        return
    assert out.dtype == np.int64
