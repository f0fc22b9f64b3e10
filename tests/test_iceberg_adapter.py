"""Read-only Iceberg adapter — genuine table bytes.

The fixture is a real HadoopTables-layout Iceberg v2 table assembled
from the public spec: `metadata/v*.metadata.json` JSON, Avro manifest
lists and manifests (written by the spec-derived encoder in
tests/test_avro_codec.py, decoded by the from-scratch avro_codec
module), and parquet data files carrying REAL parquet field IDs — the
resolution mechanism Iceberg mandates, which the rename test below
exercises the way a name-based reader would fail.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_avro_codec import encode_container
from xml_to_parquet_spark.sources.iceberg import (
    iceberg_added_files,
    iceberg_data_files,
    list_iceberg_snapshots,
    load_iceberg_metadata,
    read_iceberg_snapshot,
)

# --- spec schemas (field names per iceberg.apache.org/spec) ----------------

_KV = {
    "type": "record",
    "name": "k126_v127",
    "fields": [
        {"name": "key", "type": "int"},
        {"name": "value", "type": "bytes"},
    ],
}

_BOUNDS = ["null", {"type": "array", "items": _KV, "logicalType": "map"}]

def _manifest_entry_schema(partition_fields):
    """manifest_entry Avro schema; the data_file partition record has
    the given fields — [] for manifests under the unpartitioned spec
    (whose partition record is genuinely empty on disk)."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": partition_fields}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "lower_bounds", "type": _BOUNDS},
                    {"name": "upper_bounds",
                     "type": ["null", {"type": "array", "items": "k126_v127",
                                       "logicalType": "map"}]},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}]},
                ],
            }},
        ],
    }


_MANIFEST_ENTRY = _manifest_entry_schema(
    [{"name": "p", "type": ["null", "string"]}]
)
_MANIFEST_ENTRY_UNPART = _manifest_entry_schema([])

_MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

_ICE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "p", "required": False, "type": "string"},
    ],
}


def _le(fmt, v):
    import struct

    return struct.pack(fmt, v)


def _bounds(lo_k, hi_k):
    return (
        [{"key": 1, "value": _le("<q", lo_k)}],
        [{"key": 1, "value": _le("<q", hi_k)}],
    )


def _data_entry(path, part, n, lo, hi, status=1, content=0):
    lob, upb = _bounds(lo, hi)
    return {
        "status": status,
        "snapshot_id": None,
        "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": {"p": part},
            "record_count": n,
            "file_size_in_bytes": 1,
            "lower_bounds": lob,
            "upper_bounds": upb,
            "equality_ids": None,
        },
    }


def _delete_entry(path, n, content=1, equality_ids=None, part=None):
    return {
        "status": 1,
        "snapshot_id": None,
        "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": {"p": part},
            "record_count": n,
            "file_size_in_bytes": 1,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": equality_ids,
        },
    }


def _write_avro(path, schema, records, codec="null"):
    with open(path, "wb") as fh:
        fh.write(encode_container(schema, records, codec))


def _manifest_row(path, content, snap_id, seq=1, spec_id=0):
    return {
        "manifest_path": f"file://{path}",
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": spec_id,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 1,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }


def _pq_schema():
    return pa.schema([
        pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("p", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
    ])


def _del_schema():
    return pa.schema([
        pa.field("file_path", pa.string(),
                 metadata={b"PARQUET:field_id": b"2147483546"}),
        pa.field("pos", pa.int64(),
                 metadata={b"PARQUET:field_id": b"2147483545"}),
    ])


def _metadata_json(table, snapshots, current, schemas=None, current_schema=0):
    return {
        "format-version": 2,
        "table-uuid": "11111111-2222-3333-4444-555555555555",
        "location": f"file://{table}",
        "last-sequence-number": 2,
        "last-updated-ms": 2000,
        "last-column-id": 2,
        "schemas": schemas or [_ICE_SCHEMA],
        "current-schema-id": current_schema,
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "p", "transform": "identity",
                 "source-id": 2, "field-id": 1000}]},
            {"spec-id": 1, "fields": []},  # the unpartitioned spec
            {"spec-id": 2, "fields": [
                {"name": "p_bucket", "transform": "bucket[4]",
                 "source-id": 2, "field-id": 1001}]},
        ],
        "default-spec-id": 0,
        "snapshots": snapshots,
        "current-snapshot-id": current,
    }


@pytest.fixture(scope="module")
def ice_table(tmp_path_factory):
    """Snapshot 101 appends d0 (k=0..4, p=a) + d1 (k=5..9, p=b);
    snapshot 202 position-deletes rows 1 and 3 of d0 (k=1, k=3). The
    202 manifest list is deflate-coded to exercise that codec end-to-end."""
    table = str(tmp_path_factory.mktemp("ice"))
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    d0 = os.path.join(data, "d0.parquet")
    d1 = os.path.join(data, "d1.parquet")
    pq.write_table(pa.table(
        {"k": list(range(5)), "p": ["a"] * 5}, schema=_pq_schema()), d0)
    pq.write_table(pa.table(
        {"k": list(range(5, 10)), "p": ["b"] * 5}, schema=_pq_schema()), d1)
    del0 = os.path.join(data, "del0.parquet")
    pq.write_table(pa.table(
        {"file_path": [f"file://{d0}"] * 2, "pos": [1, 3]},
        schema=_del_schema()), del0)

    m_data = os.path.join(md, "m0.avro")
    _write_avro(m_data, _MANIFEST_ENTRY, [
        _data_entry(f"file://{d0}", "a", 5, 0, 4),
        _data_entry(f"file://{d1}", "b", 5, 5, 9),
    ])
    m_del = os.path.join(md, "m1-deletes.avro")
    _write_avro(m_del, _MANIFEST_ENTRY, [_delete_entry(f"file://{del0}", 2)])

    snap101 = os.path.join(md, "snap-101.avro")
    _write_avro(snap101, _MANIFEST_FILE, [_manifest_row(m_data, 0, 101)])
    snap202 = os.path.join(md, "snap-202.avro")
    _write_avro(snap202, _MANIFEST_FILE, [
        _manifest_row(m_data, 0, 101),
        _manifest_row(m_del, 1, 202),
    ], codec="deflate")

    snapshots = [
        {"snapshot-id": 101, "timestamp-ms": 1000, "sequence-number": 1,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{snap101}", "schema-id": 0},
        {"snapshot-id": 202, "timestamp-ms": 2000, "sequence-number": 2,
         "summary": {"operation": "delete"},
         "manifest-list": f"file://{snap202}", "schema-id": 0},
    ]
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(_metadata_json(table, snapshots, 202), fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("1")
    return table


def _rows(df):
    return {(r["k"], r["p"]) for r in df.collect()}


def test_snapshots_listed(ice_table):
    got = list_iceberg_snapshots(ice_table)
    assert [s["snapshot-id"] for s in got] == [101, 202]
    assert [s["operation"] for s in got] == ["append", "delete"]


def test_current_snapshot_applies_position_deletes(spark, ice_table):
    got = _rows(read_iceberg_snapshot(spark, ice_table))
    assert got == {(k, "a") for k in (0, 2, 4)} | {
        (k, "b") for k in range(5, 10)
    }


def test_time_travel_predates_the_delete(spark, ice_table):
    got = _rows(read_iceberg_snapshot(spark, ice_table, snapshot_id=101))
    assert got == {(k, "a") for k in range(5)} | {
        (k, "b") for k in range(5, 10)
    }


def test_partition_filter_prunes_driver_side(spark, ice_table):
    got = _rows(read_iceberg_snapshot(spark, ice_table,
                                      partition_filter={"p": "a"}))
    assert got == {(0, "a"), (2, "a"), (4, "a")}
    assert iceberg_data_files(ice_table, 101) == [
        f for f in iceberg_data_files(ice_table, 101)
    ]  # metadata listing stays intact


def test_stats_filter_prunes_files_not_rows(spark, ice_table):
    """k > 4 excludes d0 by its [0, 4] bounds: the result is exactly
    d1's rows with NO residual .filter applied — proof the pruning
    itself selected files, and only provably-excluded ones."""
    got = _rows(read_iceberg_snapshot(spark, ice_table, snapshot_id=101,
                                      stats_filter=[("k", ">", 4)]))
    assert got == {(k, "b") for k in range(5, 10)}
    # boundary: k >= 4 keeps BOTH files (d0's upper bound is exactly 4)
    got = _rows(read_iceberg_snapshot(spark, ice_table, snapshot_id=101,
                                      stats_filter=[("k", ">=", 4)]))
    assert got == {(k, "a") for k in range(5)} | {
        (k, "b") for k in range(5, 10)
    }


def test_rename_resolves_by_field_id(spark, ice_table, tmp_path):
    """v2 metadata renames k -> kk (same field ID). The data files still
    say 'k'; a name-based read would return all-null kk. Field-id
    resolution must surface the original values under the new name."""
    import shutil

    table = str(tmp_path / "renamed")
    shutil.copytree(ice_table, table)
    meta = load_iceberg_metadata(table)
    renamed = {
        "type": "struct", "schema-id": 1,
        "fields": [
            {"id": 1, "name": "kk", "required": False, "type": "long"},
            {"id": 2, "name": "p", "required": False, "type": "string"},
        ],
    }
    meta["schemas"] = [_ICE_SCHEMA, renamed]
    meta["current-schema-id"] = 1
    # the copied snapshots' manifest-list URIs point at the ORIGINAL
    # tree; those manifests in turn reference the original data files —
    # all immutable and still on disk, exactly how Iceberg metadata-only
    # operations (like this rename) behave
    with open(os.path.join(table, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(table, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")
    df = read_iceberg_snapshot(spark, table)
    assert set(df.columns) == {"kk", "p"}
    got = {(r["kk"], r["p"]) for r in df.collect()}
    assert got == {(0, "a"), (2, "a"), (4, "a")} | {
        (k, "b") for k in range(5, 10)
    }


def test_corrupt_version_hint_falls_back_to_listing(ice_table, tmp_path):
    import shutil

    table = str(tmp_path / "hint")
    shutil.copytree(ice_table, table)
    with open(os.path.join(table, "metadata", "version-hint.text"), "w") as fh:
        fh.write("not-a-number")
    meta = load_iceberg_metadata(table)
    assert meta["current-snapshot-id"] == 202


def test_deleted_status_entries_are_skipped(spark, ice_table, tmp_path):
    """A snapshot whose manifest marks d1 DELETED (status 2) serves only
    d0 — dropped files must vanish without a tombstone scan."""
    import shutil

    table = str(tmp_path / "drop")
    shutil.copytree(ice_table, table)
    md = os.path.join(table, "metadata")
    d0 = os.path.join(ice_table, "data", "d0.parquet")
    d1 = os.path.join(ice_table, "data", "d1.parquet")
    m2 = os.path.join(md, "m2.avro")
    _write_avro(m2, _MANIFEST_ENTRY, [
        _data_entry(f"file://{d0}", "a", 5, 0, 4, status=0),
        _data_entry(f"file://{d1}", "b", 5, 5, 9, status=2),
    ])
    snap303 = os.path.join(md, "snap-303.avro")
    _write_avro(snap303, _MANIFEST_FILE, [_manifest_row(m2, 0, 303)])
    meta = load_iceberg_metadata(table)
    meta["snapshots"].append(
        {"snapshot-id": 303, "timestamp-ms": 3000, "sequence-number": 3,
         "summary": {"operation": "delete"},
         "manifest-list": f"file://{snap303}", "schema-id": 0})
    meta["current-snapshot-id"] = 303
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(k, "a") for k in range(5)}


def _append_snapshot(table, snap_id, manifest_rows, ts, op="overwrite"):
    md = os.path.join(table, "metadata")
    snap = os.path.join(md, f"snap-{snap_id}.avro")
    _write_avro(snap, _MANIFEST_FILE, manifest_rows)
    meta = load_iceberg_metadata(table)
    meta["snapshots"].append(
        {"snapshot-id": snap_id, "timestamp-ms": ts, "sequence-number": 4,
         "summary": {"operation": op},
         "manifest-list": f"file://{snap}", "schema-id": 0})
    meta["current-snapshot-id"] = snap_id
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")


def test_equality_deletes_with_sequence_scoping(spark, ice_table, tmp_path):
    """An equality delete (k in {2, 7}) at sequence 2 removes matching
    rows ONLY from files at sequence < 2: d0/d1 (seq 1) lose k=2 and
    k=7, while d2 (written at seq 2, same as the delete) keeps its k=2
    row — and the carried position deletes still apply."""
    import shutil

    table = str(tmp_path / "eq")
    shutil.copytree(ice_table, table)
    md = os.path.join(table, "metadata")
    d2 = os.path.join(table, "data", "d2.parquet")
    pq.write_table(pa.table({"k": [2], "p": ["c"]}, schema=_pq_schema()), d2)
    eq1 = os.path.join(table, "data", "eq1.parquet")
    pq.write_table(pa.table(
        {"k": [2, 7]},
        schema=pa.schema([pa.field("k", pa.int64(),
                                   metadata={b"PARQUET:field_id": b"1"})])),
        eq1)
    m4 = os.path.join(md, "m4.avro")
    _write_avro(m4, _MANIFEST_ENTRY,
                [_data_entry(f"file://{d2}", "c", 1, 2, 2)])
    m5 = os.path.join(md, "m5-eq.avro")
    _write_avro(m5, _MANIFEST_ENTRY_UNPART,
                [_delete_entry(f"file://{eq1}", 2, content=2,
                               equality_ids=[1])])
    _append_snapshot(table, 404, [
        _manifest_row(os.path.join(md, "m0.avro"), 0, 101, seq=1),
        _manifest_row(os.path.join(md, "m1-deletes.avro"), 1, 202, seq=1),
        _manifest_row(m4, 0, 404, seq=2),
        # the GLOBAL equality delete: written under the unpartitioned
        # spec — that, not its partition values, is what makes it global
        _manifest_row(m5, 1, 404, seq=2, spec_id=1),
    ], ts=4000)
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(0, "a"), (4, "a")} | {
        (k, "b") for k in (5, 6, 8, 9)
    } | {(2, "c")}


def test_equality_delete_null_safe_matching(spark, tmp_path):
    """A delete row with a NULL key matches data rows with NULL there
    (the spec's null-safe equality), never every row."""
    table = str(tmp_path)
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    d0 = os.path.join(data, "d0.parquet")
    pq.write_table(pa.table({"k": pa.array([None, 1, 2], pa.int64()),
                             "p": ["a"] * 3}, schema=_pq_schema()), d0)
    eq = os.path.join(data, "eq.parquet")
    pq.write_table(pa.table(
        {"k": pa.array([None], pa.int64())},
        schema=pa.schema([pa.field("k", pa.int64(),
                                   metadata={b"PARQUET:field_id": b"1"})])),
        eq)
    m0 = os.path.join(md, "m0.avro")
    _write_avro(m0, _MANIFEST_ENTRY, [{
        "status": 1, "snapshot_id": None, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {"content": 0, "file_path": f"file://{d0}",
                      "file_format": "PARQUET", "partition": {"p": "a"},
                      "record_count": 3, "file_size_in_bytes": 1,
                      "lower_bounds": None, "upper_bounds": None,
                      "equality_ids": None}}])
    m1 = os.path.join(md, "m1.avro")
    _write_avro(m1, _MANIFEST_ENTRY_UNPART,
                [_delete_entry(f"file://{eq}", 1, content=2,
                               equality_ids=[1])])
    snap = os.path.join(md, "snap-1.avro")
    _write_avro(snap, _MANIFEST_FILE, [
        _manifest_row(m0, 0, 1, seq=1),
        _manifest_row(m1, 1, 1, seq=2, spec_id=1),
    ])
    snapshots = [{"snapshot-id": 1, "timestamp-ms": 1000,
                  "sequence-number": 2, "summary": {"operation": "delete"},
                  "manifest-list": f"file://{snap}", "schema-id": 0}]
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(_metadata_json(table, snapshots, 1), fh)
    got = {(r["k"], r["p"])
           for r in read_iceberg_snapshot(spark, table).collect()}
    assert got == {(1, "a"), (2, "a")}


def _eq_delete_table(ice_table, tmp_path, part, spec_id, ks=(2, 7)):
    """Copy of the module table plus one equality-delete of `ks`,
    written under `spec_id` with partition value `part`."""
    import shutil

    table = str(tmp_path / "eqpart")
    shutil.copytree(ice_table, table)
    md = os.path.join(table, "metadata")
    eq = os.path.join(table, "data", "eqp.parquet")
    pq.write_table(pa.table(
        {"k": pa.array(list(ks), pa.int64())},
        schema=pa.schema([pa.field("k", pa.int64(),
                                   metadata={b"PARQUET:field_id": b"1"})])),
        eq)
    m_eq = os.path.join(md, "m-eq.avro")
    _write_avro(m_eq, _MANIFEST_ENTRY,
                [_delete_entry(f"file://{eq}", len(ks), content=2,
                               equality_ids=[1], part=part)])
    _append_snapshot(table, 404, [
        _manifest_row(os.path.join(md, "m0.avro"), 0, 101, seq=1),
        _manifest_row(m_eq, 1, 404, seq=2, spec_id=spec_id),
    ], ts=4000)
    return table


def test_partition_scoped_equality_delete_identity(spark, ice_table, tmp_path):
    """A delete of k in {2, 7} SCOPED to partition p=a (identity
    transform): k=2 lives in p=a and dies; k=7 lives in p=b and
    SURVIVES despite matching the equality columns."""
    table = _eq_delete_table(ice_table, tmp_path, part="a", spec_id=0)
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(k, "a") for k in (0, 1, 3, 4)} | {
        (k, "b") for k in range(5, 10)
    }


def test_null_partition_scope_is_not_global(spark, ice_table, tmp_path):
    """A delete under the PARTITIONED spec with a NULL partition value
    scopes to the null partition — it must not delete anything from
    p=a/p=b. (Treating null values as 'global' would be the unsound
    reading; global means the unpartitioned SPEC.)"""
    table = _eq_delete_table(ice_table, tmp_path, part=None, spec_id=0)
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(k, "a") for k in range(5)} | {
        (k, "b") for k in range(5, 10)
    }


def test_nonidentity_scope_refuses_on_cross_spec_data(spark, ice_table,
                                                      tmp_path):
    """A bucket-scoped delete CAN apply by stored-tuple file matching
    (r14, tests below) — but only against data files written under the
    SAME spec. Here the data files are spec-0 (identity), so membership
    in the delete's bucket is unprovable without evaluating the
    transform: refuse loudly."""
    table = _eq_delete_table(ice_table, tmp_path, part="a", spec_id=2)
    with pytest.raises(ValueError, match="transform evaluation"):
        read_iceberg_snapshot(spark, table)


def _bucket_table(tmp_path, delete_bucket, data_buckets=(0, 1)):
    """Two data files under the bucket[4] spec (stored tuples
    p_bucket=data_buckets[0] and [1]) + an equality delete of k in
    {1, 6} scoped to `delete_bucket` — applied by stored-tuple
    matching, no transform evaluation."""
    entry_schema = _manifest_entry_schema(
        [{"name": "p_bucket", "type": ["null", "int"]}]
    )
    table = str(tmp_path / "ice_bucket")
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    d0 = os.path.join(data, "b0.parquet")
    d1 = os.path.join(data, "b1.parquet")
    pq.write_table(pa.table(
        {"k": [0, 1, 2], "p": ["a"] * 3}, schema=_pq_schema()), d0)
    pq.write_table(pa.table(
        {"k": [5, 6, 7], "p": ["b"] * 3}, schema=_pq_schema()), d1)
    eq = os.path.join(data, "eq.parquet")
    pq.write_table(pa.table(
        {"k": pa.array([1, 6], pa.int64())},
        schema=pa.schema([pa.field("k", pa.int64(),
                                   metadata={b"PARQUET:field_id": b"1"})])),
        eq)

    def _bentry(path, bucket, n, lo, hi, content=0, equality_ids=None):
        e = _data_entry(f"file://{path}", None, n, lo, hi, content=content)
        e["data_file"]["partition"] = {"p_bucket": bucket}
        e["data_file"]["equality_ids"] = equality_ids
        if content == 2:
            e["data_file"]["lower_bounds"] = None
            e["data_file"]["upper_bounds"] = None
        return e

    m0 = os.path.join(md, "m0.avro")
    _write_avro(m0, entry_schema, [
        _bentry(d0, data_buckets[0], 3, 0, 2),
        _bentry(d1, data_buckets[1], 3, 5, 7)])
    m_eq = os.path.join(md, "m-eq.avro")
    _write_avro(m_eq, entry_schema,
                [_bentry(eq, delete_bucket, 2, 0, 0, content=2,
                         equality_ids=[1])])
    snap = os.path.join(md, "snap-601.avro")
    _write_avro(snap, _MANIFEST_FILE, [
        _manifest_row(m0, 0, 601, seq=1, spec_id=2),
        _manifest_row(m_eq, 1, 601, seq=2, spec_id=2),
    ])
    snapshots = [
        {"snapshot-id": 601, "timestamp-ms": 1000, "sequence-number": 2,
         "summary": {"operation": "overwrite"},
         "manifest-list": f"file://{snap}", "schema-id": 0},
    ]
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(_metadata_json(table, snapshots, 601), fh)
    return table


def test_bucket_scoped_equality_delete_applies_by_stored_tuple(
    spark, tmp_path
):
    """k in {1, 6} deleted, scoped to bucket 0: k=1 (in the bucket-0
    file) dies; k=6 (bucket-1 file) SURVIVES despite matching the
    equality columns — the file-level stored-tuple scope, no transform
    evaluated anywhere."""
    table = _bucket_table(tmp_path, delete_bucket=0)
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(0, "a"), (2, "a"), (5, "b"), (6, "b"), (7, "b")}


def test_bucket_scoped_delete_with_no_matching_file_noops(spark, tmp_path):
    table = _bucket_table(tmp_path, delete_bucket=3)
    got = _rows(read_iceberg_snapshot(spark, table))
    assert got == {(0, "a"), (1, "a"), (2, "a"), (5, "b"), (6, "b"), (7, "b")}


def test_unknown_snapshot_and_missing_table_refused(spark, ice_table, tmp_path):
    with pytest.raises(ValueError, match="not in table"):
        read_iceberg_snapshot(spark, ice_table, snapshot_id=999)
    with pytest.raises(FileNotFoundError):
        list_iceberg_snapshots(str(tmp_path / "nope"))


def test_incremental_appends(ice_table, tmp_path):
    """(None, 101] is the initial append: exactly d0+d1, stamped with
    the adding snapshot. A window crossing the delete snapshot refuses —
    deletes cannot be an append-only increment."""
    got = iceberg_added_files(ice_table, None, 101)
    assert [(s, os.path.basename(p)) for s, p in got] == [
        (101, "d0.parquet"), (101, "d1.parquet"),
    ]
    with pytest.raises(ValueError, match="delete"):
        iceberg_added_files(ice_table, 101, 202)
    with pytest.raises(ValueError, match="not in table"):
        iceberg_added_files(ice_table, 999)
    with pytest.raises(ValueError, match="runs forward"):
        iceberg_added_files(ice_table, 202, 101)


def test_incremental_appends_second_snapshot(spark, ice_table, tmp_path):
    """A genuine second append (d2) yields exactly d2 for (101, 303] —
    the reused first-append manifest (added_snapshot_id=101) must not
    re-deliver d0/d1."""
    import shutil

    table = str(tmp_path / "app")
    shutil.copytree(ice_table, table)
    md = os.path.join(table, "metadata")
    d2 = os.path.join(table, "data", "d2.parquet")
    pq.write_table(pa.table(
        {"k": [100], "p": ["c"]}, schema=_pq_schema()), d2)
    m3 = os.path.join(md, "m3.avro")
    _write_avro(m3, _MANIFEST_ENTRY, [
        _data_entry(f"file://{d2}", "c", 1, 100, 100, status=1)])
    # live manifests carry forward: the first append's data manifest AND
    # the delete manifest, exactly as a real writer's new manifest list
    m0 = os.path.join(md, "m0.avro")
    m1 = os.path.join(md, "m1-deletes.avro")
    snap303 = os.path.join(md, "snap-303.avro")
    _write_avro(snap303, _MANIFEST_FILE, [
        _manifest_row(m0, 0, 101),
        _manifest_row(m1, 1, 202),
        _manifest_row(m3, 0, 303),
    ])
    meta = load_iceberg_metadata(table)
    meta["snapshots"].append(
        {"snapshot-id": 303, "timestamp-ms": 3000, "sequence-number": 3,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{snap303}", "schema-id": 0})
    meta["current-snapshot-id"] = 303
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    got = iceberg_added_files(table, 202)  # (202, current=303]
    assert [(s, os.path.basename(p)) for s, p in got] == [
        (303, "d2.parquet")]
    # the snapshot read at 303 sees all three files, with the carried
    # delete manifest still masking d0's deleted rows
    rows = {(r["k"], r["p"])
            for r in read_iceberg_snapshot(spark, table, 303).collect()}
    assert rows == {(0, "a"), (2, "a"), (4, "a")} | {
        (k, "b") for k in range(5, 10)
    } | {(100, "c")}


def test_remote_uri_refused(ice_table, tmp_path):
    import shutil

    table = str(tmp_path / "s3")
    shutil.copytree(ice_table, table)
    meta = load_iceberg_metadata(table)
    meta["snapshots"][1]["manifest-list"] = "s3://bucket/snap.avro"
    md = os.path.join(table, "metadata")
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(ValueError, match="non-local"):
        iceberg_data_files(table)


# ---------------------------------------------------------------------------
# lake_iceberg_snapshot — the registered driver-proof query over this
# adapter (VERDICT r13 #3): independent pandas recompute + scan-set pins
# ---------------------------------------------------------------------------


def _iceberg_op_fixture(spark, sf_dir):
    from xml_to_parquet_spark.operators.sources_io import (
        _ensure_iceberg_fixture,
    )

    root = _ensure_iceberg_fixture(spark, sf_dir)
    assert root is not None
    return root


def test_lake_iceberg_snapshot_matches_pandas_recompute(spark, sf_dir):
    """Third formulation: plain pandas over the source table and the
    fixture's key-split/modulus rules — no Spark, no DuckDB, no
    manifests."""
    import pandas as pd

    from xml_to_parquet_spark.operators.sources_io import (
        ICE_EQ_MOD,
        ICE_POS_MOD,
        SNAP_SPLIT,
    )
    from xml_to_parquet_spark.registry import lookup

    _iceberg_op_fixture(spark, sf_dir)
    got = {
        (r["snap"], r["o_orderstatus"]): (
            r["n_orders"], r["price_cents"], r["min_key"], r["max_key"]
        )
        for r in lookup("lake_iceberg_snapshot").fn(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )

    def expect(sub):
        out = {}
        for s, g in sub.groupby("o_orderstatus"):
            cents = int((g["o_totalprice"] * 100).round().astype("int64").sum())
            out[s] = (len(g), cents, int(g["o_orderkey"].min()),
                      int(g["o_orderkey"].max()))
        return out

    k, st = orders["o_orderkey"], orders["o_orderstatus"]
    head = orders[k < SNAP_SPLIT]
    cur_f = orders[
        (st == "F")
        & ~((k < SNAP_SPLIT) & (k % ICE_POS_MOD == 3))
        & (k % ICE_EQ_MOD != 4)
    ]
    cur_tail = orders[(k >= SNAP_SPLIT)
                      & ((k % ICE_EQ_MOD != 4) | (st == "O"))]
    want = {}
    for label, sub in [("s101_head", head), ("cur_F", cur_f),
                       ("cur_tail", cur_tail)]:
        for s, tup in expect(sub).items():
            want[(label, s)] = tup
    assert got == want


def test_lake_iceberg_snapshot_scan_sets(spark, sf_dir):
    """The three reads plan over exactly the file sets the manifests
    dictate: snapshot 101 → only head_* files; current + partition F →
    head_F and tail_F only (the O re-add is partition-pruned); current +
    stats tail filter → tail_* plus the re-add, never a head file."""
    from xml_to_parquet_spark.operators.sources_io import SNAP_SPLIT

    root = _iceberg_op_fixture(spark, sf_dir)

    def scanned(df):
        return {
            os.path.relpath(f.removeprefix("file:"), root).split(os.sep)[1]
            for f in df.inputFiles()
        }

    DELETE_DIRS = {"posdel", "eqdel"}  # delete files legitimately read
    # by the anti-join side; the pins below are about DATA files only

    def data_dirs(df):
        return scanned(df) - DELETE_DIRS

    s101 = read_iceberg_snapshot(spark, root, snapshot_id=101)
    assert data_dirs(s101) and all(
        d.startswith("head_") for d in data_dirs(s101)
    )
    assert scanned(s101) == data_dirs(s101)  # 101 predates the deletes
    cur_f = read_iceberg_snapshot(
        spark, root, partition_filter={"o_orderstatus": "F"}
    )
    assert data_dirs(cur_f) == {"head_F", "tail_F"}
    cur_tail = read_iceberg_snapshot(
        spark, root, stats_filter=[("o_orderkey", ">=", SNAP_SPLIT)]
    )
    got = data_dirs(cur_tail)
    assert all(d.startswith("tail_") or d == "readd_O" for d in got)
    assert any(d.startswith("tail_") for d in got)


def test_lake_iceberg_fixture_files_carry_field_ids(spark, sf_dir):
    """The Spark-written fixture data files carry REAL parquet field IDs
    (fieldId.write from the attached schema metadata) — the substrate
    the adapter's by-id column resolution runs on."""
    import glob

    root = _iceberg_op_fixture(spark, sf_dir)
    f = sorted(glob.glob(os.path.join(root, "data", "head_*", "*.parquet")))[0]
    sch = pq.read_schema(f)
    ids = {
        name: sch.field(name).metadata.get(b"PARQUET:field_id")
        for name in sch.names
    }
    assert ids == {
        "o_orderkey": b"1", "o_orderstatus": b"2", "o_totalprice": b"3"
    }


def test_lake_iceberg_sequence_scoped_readd_survives(spark, sf_dir):
    """The full-table current read: every o_orderkey % ICE_EQ_MOD == 4
    key is gone EXCEPT status-'O' rows, which the seq-3 re-add restores
    exactly once — the upsert invariant that breaks under either missing
    seq scoping (re-adds deleted too) or ignored equality deletes
    (originals double-count)."""
    import pandas as pd

    from xml_to_parquet_spark.operators.sources_io import ICE_EQ_MOD

    root = _iceberg_op_fixture(spark, sf_dir)
    cur = read_iceberg_snapshot(spark, root).toPandas()
    matches = cur[cur["o_orderkey"] % ICE_EQ_MOD == 4]
    assert set(matches["o_orderstatus"].unique()) <= {"O"}
    # exactly once: keys unique among the re-added survivors
    assert matches["o_orderkey"].is_unique
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    want_o = orders[(orders["o_orderkey"] % ICE_EQ_MOD == 4)
                    & (orders["o_orderstatus"] == "O")]
    assert len(matches) == len(want_o)


# ---------------------------------------------------------------------------
# nested read schemas (r14): struct / list / map translate natively, with
# field-id resolution at EVERY nesting level
# ---------------------------------------------------------------------------


_NESTED_ICE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "s", "required": False, "type": {
            "type": "struct", "fields": [
                # CURRENT name x2; the data file wrote this as old_x —
                # only id-based resolution inside the struct surfaces it
                {"id": 10, "name": "x2", "required": False, "type": "long"},
                {"id": 11, "name": "y", "required": False, "type": "string"},
            ]}},
        {"id": 3, "name": "tags", "required": False, "type": {
            "type": "list", "element-id": 5, "element": "string",
            "element-required": False}},
        {"id": 6, "name": "lst", "required": False, "type": {
            "type": "list", "element-id": 20,
            "element": {"type": "struct", "fields": [
                {"id": 21, "name": "k2", "required": False, "type": "long"},
            ]},
            "element-required": False}},
        {"id": 7, "name": "m", "required": False, "type": {
            "type": "map", "key-id": 8, "key": "string",
            "value-id": 9, "value": "double", "value-required": False}},
    ],
}


def test_nested_types_read_with_field_id_resolution(spark, tmp_path):
    table = str(tmp_path / "ice_nested")
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    d0 = os.path.join(data, "d0.parquet")
    inner = pa.struct([
        pa.field("old_x", pa.int64(), metadata={b"PARQUET:field_id": b"10"}),
        pa.field("y", pa.string(), metadata={b"PARQUET:field_id": b"11"}),
    ])
    elem = pa.field(
        "element",
        pa.struct([
            pa.field("old_k", pa.int64(),
                     metadata={b"PARQUET:field_id": b"21"}),
        ]),
        metadata={b"PARQUET:field_id": b"20"},
    )
    sch = pa.schema([
        pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("s", inner, metadata={b"PARQUET:field_id": b"2"}),
        pa.field("tags",
                 pa.list_(pa.field("element", pa.string(),
                                   metadata={b"PARQUET:field_id": b"5"})),
                 metadata={b"PARQUET:field_id": b"3"}),
        pa.field("lst", pa.list_(elem),
                 metadata={b"PARQUET:field_id": b"6"}),
        pa.field("m", pa.map_(pa.string(), pa.float64()),
                 metadata={b"PARQUET:field_id": b"7"}),
    ])
    pq.write_table(pa.table({
        "k": [1, 2],
        "s": [{"old_x": 10, "y": "a"}, {"old_x": 20, "y": "b"}],
        "tags": [["t1", "t2"], []],
        "lst": [[{"old_k": 5}], [{"old_k": 6}, {"old_k": 7}]],
        "m": [[("a", 1.5)], [("b", 2.5)]],
    }, schema=sch), d0)

    e = _data_entry(f"file://{d0}", None, 2, 1, 2)
    e["data_file"]["partition"] = {}
    m0 = os.path.join(md, "m0.avro")
    _write_avro(m0, _MANIFEST_ENTRY_UNPART, [e])
    snap = os.path.join(md, "snap-501.avro")
    _write_avro(snap, _MANIFEST_FILE, [_manifest_row(m0, 0, 501, spec_id=1)])
    snapshots = [
        {"snapshot-id": 501, "timestamp-ms": 1000, "sequence-number": 1,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{snap}", "schema-id": 0},
    ]
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(_metadata_json(table, snapshots, 501,
                                 schemas=[_NESTED_ICE_SCHEMA]), fh)

    df = read_iceberg_snapshot(spark, table)
    assert [f.name for f in df.schema.fields] == ["k", "s", "tags", "lst", "m"]
    rows = {r["k"]: r for r in df.collect()}
    # nested struct rename (old_x -> x2) resolves BY ID inside the struct
    assert (rows[1]["s"]["x2"], rows[1]["s"]["y"]) == (10, "a")
    assert (rows[2]["s"]["x2"], rows[2]["s"]["y"]) == (20, "b")
    assert rows[1]["tags"] == ["t1", "t2"] and rows[2]["tags"] == []
    # struct nested in a list element renames by id too (old_k -> k2)
    assert [x["k2"] for x in rows[1]["lst"]] == [5]
    assert [x["k2"] for x in rows[2]["lst"]] == [6, 7]
    assert rows[1]["m"] == {"a": 1.5} and rows[2]["m"] == {"b": 2.5}


def test_unknown_nested_type_still_refused():
    from xml_to_parquet_spark.sources.iceberg import _spark_type

    with pytest.raises(ValueError, match="not served"):
        _spark_type({"type": "variant"})
    with pytest.raises(ValueError, match="not served"):
        _spark_type("uuid")


# ---------------------------------------------------------------------------
# time travel fidelity (r14): a snapshot reads under ITS schema, and
# as-of-timestamp resolution follows the snapshot-log
# ---------------------------------------------------------------------------


def test_time_travel_reads_the_snapshots_own_schema(spark, tmp_path):
    """Snapshot 101 was committed under schema 0 (k, p); schema 1 then
    renamed k->k_renamed and added v. Reading 101 surfaces the OLD
    column names and no v; reading 202 (committed under schema 1)
    surfaces k_renamed (old files resolve by field id) and a null v."""
    table = str(tmp_path / "ice_schemaev")
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    d0 = os.path.join(data, "d0.parquet")
    pq.write_table(pa.table(
        {"k": [1, 2], "p": ["a", "b"]}, schema=_pq_schema()), d0)
    e = _data_entry(f"file://{d0}", None, 2, 1, 2)
    e["data_file"]["partition"] = {}
    m0 = os.path.join(md, "m0.avro")
    _write_avro(m0, _MANIFEST_ENTRY_UNPART, [e])
    l1 = os.path.join(md, "snap-101.avro")
    _write_avro(l1, _MANIFEST_FILE, [_manifest_row(m0, 0, 101, spec_id=1)])
    l2 = os.path.join(md, "snap-202.avro")
    _write_avro(l2, _MANIFEST_FILE, [_manifest_row(m0, 0, 101, spec_id=1)])
    schema1 = {
        "type": "struct", "schema-id": 1,
        "fields": [
            {"id": 1, "name": "k_renamed", "required": False, "type": "long"},
            {"id": 2, "name": "p", "required": False, "type": "string"},
            {"id": 3, "name": "v", "required": False, "type": "double"},
        ],
    }
    snapshots = [
        {"snapshot-id": 101, "timestamp-ms": 1000, "sequence-number": 1,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{l1}", "schema-id": 0},
        {"snapshot-id": 202, "parent-snapshot-id": 101,
         "timestamp-ms": 2000, "sequence-number": 2,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{l2}", "schema-id": 1},
    ]
    meta = _metadata_json(table, snapshots, 202,
                          schemas=[_ICE_SCHEMA, schema1], current_schema=1)
    meta["snapshot-log"] = [
        {"snapshot-id": 101, "timestamp-ms": 1000},
        {"snapshot-id": 202, "timestamp-ms": 2000},
    ]
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)

    old = read_iceberg_snapshot(spark, table, snapshot_id=101)
    assert [f.name for f in old.schema.fields] == ["k", "p"]
    assert {(r["k"], r["p"]) for r in old.collect()} == {(1, "a"), (2, "b")}
    cur = read_iceberg_snapshot(spark, table)
    assert [f.name for f in cur.schema.fields] == ["k_renamed", "p", "v"]
    got = {(r["k_renamed"], r["p"], r["v"]) for r in cur.collect()}
    assert got == {(1, "a", None), (2, "b", None)}


def test_snapshot_as_of_timestamp(ice_table, tmp_path):
    from xml_to_parquet_spark.sources.iceberg import iceberg_snapshot_as_of

    # the module fixture has snapshots 101@1000 and 202@2000, no
    # snapshot-log -> lineage fallback
    assert iceberg_snapshot_as_of(ice_table, 1000) == 101
    assert iceberg_snapshot_as_of(ice_table, 1999) == 101
    assert iceberg_snapshot_as_of(ice_table, 2000) == 202
    assert iceberg_snapshot_as_of(ice_table, 10_000) == 202
    with pytest.raises(ValueError, match="predates"):
        iceberg_snapshot_as_of(ice_table, 999)
    # with a snapshot-log, the LOG is authoritative even under clock skew
    import shutil

    table = str(tmp_path / "asof_log")
    shutil.copytree(ice_table, table)
    meta = load_iceberg_metadata(table)
    meta["snapshot-log"] = [
        {"snapshot-id": 101, "timestamp-ms": 1000},
        {"snapshot-id": 202, "timestamp-ms": 1500},  # log beats snapshot ts
    ]
    md = os.path.join(table, "metadata")
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write("2")
    assert iceberg_snapshot_as_of(table, 1600) == 202


# ---------------------------------------------------------------------------
# partition transforms (r14): the spec's seed-0 Murmur3 + source-value
# pruning — bucket pruning without precomputed bucket numbers
# ---------------------------------------------------------------------------


def test_murmur3_matches_the_spec_vectors():
    """iceberg.apache.org/spec Appendix B publishes these: hashing the
    8-byte little-endian long (so int 34 == long 34) and UTF-8 bytes."""
    import struct as _struct

    from xml_to_parquet_spark.sources.iceberg import murmur3_x86_32

    assert murmur3_x86_32(_struct.pack("<q", 34)) == 2017239379
    assert murmur3_x86_32(b"iceberg") == 1210000089


def test_transform_evaluation_unit_cases():
    from xml_to_parquet_spark.sources.iceberg import _apply_transform

    assert _apply_transform("identity", "x") == (True, "x")
    assert _apply_transform("bucket[16]", 34) == (True, 3)
    assert _apply_transform("bucket[16]", None) == (True, None)
    assert _apply_transform("truncate[10]", 7) == (True, 0)
    assert _apply_transform("truncate[10]", -1) == (True, -10)  # floor, not trunc
    assert _apply_transform("truncate[3]", "iceberg") == (True, "ice")
    # unevaluable transforms report so (pruning keeps the entry)
    assert _apply_transform("year", 17000)[0] is False
    assert _apply_transform("month", 17000)[0] is False
    with pytest.raises(ValueError, match="non-positive"):
        _apply_transform("bucket[0]", 1)


def test_source_partition_filter_prunes_bucket_entries(spark, tmp_path):
    """The caller passes the SOURCE value ('a'); the adapter evaluates
    bucket[4] itself and keeps only the file whose stored tuple matches
    — the usable form of bucket pruning. Fixture stored tuples are the
    REAL bucket numbers of the rows' p values, computed with the same
    published algorithm."""
    from xml_to_parquet_spark.sources.iceberg import murmur3_x86_32

    def b4(s):
        return (murmur3_x86_32(s.encode()) & 0x7FFFFFFF) % 4

    assert b4("a") != b4("b")  # distinct buckets make the pin meaningful
    # delete_bucket=that of neither file: the eq delete no-ops here
    table = _bucket_table(tmp_path, delete_bucket=(b4("a") + 2) % 4,
                          data_buckets=(b4("a"), b4("b")))
    got = _rows(read_iceberg_snapshot(
        spark, table, source_partition_filter={"p": "a"}))
    assert got == {(0, "a"), (1, "a"), (2, "a")}
    got = _rows(read_iceberg_snapshot(
        spark, table, source_partition_filter={"p": "b"}))
    assert got == {(5, "b"), (6, "b"), (7, "b")}


def test_source_partition_filter_validates(spark, tmp_path):
    from xml_to_parquet_spark.sources.iceberg import murmur3_x86_32

    def b4(s):
        return (murmur3_x86_32(s.encode()) & 0x7FFFFFFF) % 4

    table = _bucket_table(tmp_path, delete_bucket=3,
                          data_buckets=(b4("a"), b4("b")))
    with pytest.raises(ValueError, match="not in\nthe schema".replace("\n", " ")):
        read_iceberg_snapshot(spark, table,
                              source_partition_filter={"typo": 1})
    # k is a schema column but no spec sources it: the filter could
    # never prune — raise instead of silently reading as if honored
    with pytest.raises(ValueError, match="not.*partition sources"):
        read_iceberg_snapshot(spark, table,
                              source_partition_filter={"k": 1})


def test_temporal_transform_evaluation():
    """year/month/day/hour per the spec's epoch-relative definitions,
    evaluated only from unambiguous datetime inputs — an int could be a
    day ordinal or epoch micros, so ints report unevaluable (keep)."""
    import datetime as dt

    from xml_to_parquet_spark.sources.iceberg import _apply_transform

    d = dt.date(2017, 11, 16)
    assert _apply_transform("year", d) == (True, 47)
    assert _apply_transform("month", d) == (True, 47 * 12 + 10)
    assert _apply_transform("day", d) == (True, 17486)
    t = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert _apply_transform("hour", t) == (True, 17486 * 24 + 22)
    assert _apply_transform("year", t) == (True, 47)
    # pre-epoch floors, not truncates
    assert _apply_transform("year", dt.date(1969, 12, 31)) == (True, -1)
    assert _apply_transform("day", dt.date(1969, 12, 31)) == (True, -1)
    # ambiguity refuses to prune
    assert _apply_transform("year", 17486)[0] is False
    assert _apply_transform("hour", d)[0] is False


def test_decimal_bounds_decode_exactly():
    """Decimal bounds (minimal big-endian two's-complement unscaled per
    spec Appendix D) decode to EXACT Fractions — boundary comparisons in
    _entry_survives cannot flip on float representability."""
    from fractions import Fraction

    from xml_to_parquet_spark.sources.iceberg import (
        _decode_bound,
        _entry_survives,
    )

    # 14.20 as decimal(9, 2): unscaled 1420 -> bytes 0x05 0x8C
    assert _decode_bound("decimal(9, 2)", b"\x05\x8c") == Fraction(142, 10)
    # negative: -1.01 -> unscaled -101 -> minimal two's complement 0x9B
    assert _decode_bound("decimal(9, 2)", b"\x9b") == Fraction(-101, 100)
    # an entry with decimal bounds [14.20, 20.00] under field id 1
    entry = {
        "lower_bounds": [{"key": 1, "value": b"\x05\x8c"}],
        "upper_bounds": [{"key": 1, "value": b"\x07\xd0"}],
    }
    preds_keep = [(1, "decimal(9, 2)", ">=", 14.2)]
    preds_prune = [(1, "decimal(9, 2)", ">", 20.0)]
    assert _entry_survives(entry, preds_keep)
    assert not _entry_survives(entry, preds_prune)
    # boundary exactness: lit 14.2 (a non-representable float, actually
    # 14.19999...) must NOT prune a file whose upper bound is exactly
    # 14.20 under op ">=" — Fraction comparison gets this right
    assert _entry_survives(
        {"lower_bounds": None,
         "upper_bounds": [{"key": 1, "value": b"\x05\x8c"}]},
        [(1, "decimal(9, 2)", ">=", 14.2)],
    )


def _date_identity_table(tmp_path):
    """Identity DATE-partitioned table, stored partition values in the
    manifest's REAL storage form (day-ordinal ints, what the Avro layer
    yields for logical-type date): two single-date files."""
    import datetime as _dtt

    table = str(tmp_path / "ice_date")
    md = os.path.join(table, "metadata")
    data = os.path.join(table, "data")
    os.makedirs(md)
    os.makedirs(data)
    schema = pa.schema([
        pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("d", pa.date32(), metadata={b"PARQUET:field_id": b"2"}),
    ])
    d15, d16 = _dtt.date(2024, 1, 15), _dtt.date(2024, 1, 16)
    epoch = _dtt.date(1970, 1, 1)
    f0 = os.path.join(data, "d15.parquet")
    f1 = os.path.join(data, "d16.parquet")
    pq.write_table(pa.table({"k": [1, 2], "d": [d15, d15]}, schema=schema), f0)
    pq.write_table(pa.table({"k": [3], "d": [d16]}, schema=schema), f1)
    entry_schema = _manifest_entry_schema(
        [{"name": "d", "type": ["null", "int"]}]
    )

    def _dentry(path, ordinal, n, lo, hi):
        e = _data_entry(f"file://{path}", None, n, lo, hi)
        e["data_file"]["partition"] = {"d": ordinal}
        return e

    m0 = os.path.join(md, "m0.avro")
    _write_avro(m0, entry_schema, [
        _dentry(f0, (d15 - epoch).days, 2, 1, 2),
        _dentry(f1, (d16 - epoch).days, 1, 3, 3),
    ])
    snap = os.path.join(md, "snap-701.avro")
    _write_avro(snap, _MANIFEST_FILE, [_manifest_row(m0, 0, 701, seq=1)])
    meta = {
        "format-version": 2,
        "table-uuid": "11111111-2222-3333-4444-666666666666",
        "location": f"file://{table}",
        "last-sequence-number": 1,
        "last-updated-ms": 1000,
        "last-column-id": 2,
        "schemas": [{
            "type": "struct", "schema-id": 0,
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "d", "required": False, "type": "date"},
            ],
        }],
        "current-schema-id": 0,
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "d", "transform": "identity",
                 "source-id": 2, "field-id": 1000}]},
        ],
        "default-spec-id": 0,
        "snapshots": [
            {"snapshot-id": 701, "timestamp-ms": 1000,
             "sequence-number": 1, "summary": {"operation": "append"},
             "manifest-list": f"file://{snap}", "schema-id": 0},
        ],
        "current-snapshot-id": 701,
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return table


def test_source_filter_identity_date_compares_in_storage_form(
    spark, tmp_path
):
    """The caller passes the SOURCE value (a datetime.date); the stored
    partition value is the day-ordinal INT the Avro layer yields for a
    logical-type date. Before _stored_repr, the identity transform
    compared the date object against the int — unequal for the MATCHING
    file too, so every file was silently pruned (rows lost, violating
    the 'can only skip work, never rows' contract). Now the transform
    output normalizes to the storage representation first."""
    import datetime as _dtt

    table = _date_identity_table(tmp_path)
    # no filter: everything
    got = {(r["k"], r["d"]) for r in
           read_iceberg_snapshot(spark, table).collect()}
    d15, d16 = _dtt.date(2024, 1, 15), _dtt.date(2024, 1, 16)
    assert got == {(1, d15), (2, d15), (3, d16)}
    # source filter with the DATE object keeps exactly the matching file
    df = read_iceberg_snapshot(
        spark, table, source_partition_filter={"d": d15})
    assert {(r["k"], r["d"]) for r in df.collect()} == {(1, d15), (2, d15)}
    assert len(df.inputFiles()) == 1
    # a float source value keeps entries (no sound storage form) rather
    # than wrongly pruning across float32-storage representations
    from xml_to_parquet_spark.sources.iceberg import _stored_repr

    assert _stored_repr(0.1) == (False, None)
    assert _stored_repr(d15) == (True, (d15 - _dtt.date(1970, 1, 1)).days)
    aware = _dtt.datetime(2024, 1, 15, 12, 0, 0,
                          tzinfo=_dtt.timezone(_dtt.timedelta(hours=2)))
    ok, micros = _stored_repr(aware)
    assert ok and micros == int(
        aware.astimezone(_dtt.timezone.utc).timestamp() * 1_000_000
    )


def test_partition_filter_rejects_datetime_literals(spark, tmp_path):
    """Stored partition values are integer encodings; a datetime/date
    literal can never match and silently pruned every file. Refused
    loudly now, naming both sound alternatives."""
    import datetime as _dtt

    table = _date_identity_table(tmp_path)
    with pytest.raises(ValueError, match="source_partition_filter"):
        read_iceberg_snapshot(
            spark, table,
            partition_filter={"d": _dtt.date(2024, 1, 15)})
    # the stored int form works, as documented
    epoch = _dtt.date(1970, 1, 1)
    df = read_iceberg_snapshot(
        spark, table,
        partition_filter={"d": (_dtt.date(2024, 1, 15) - epoch).days})
    assert {r["k"] for r in df.collect()} == {1, 2}
