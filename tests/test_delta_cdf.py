"""Change-data-feed reads over the Delta log adapter (delta_changes).

Fixtures are genuine protocol bytes: hand-written versioned JSON
commits per delta-io PROTOCOL.md, pyarrow-written data files, and
`_change_data/` cdc parquet files physically carrying `_change_type` —
the exact layout a CDF-enabled Delta writer produces. The reader must
reproduce Delta's own CDF semantics: cdc actions describe their commit
exactly (adds/removes in the same commit are state, not changes),
commits without cdc synthesize inserts from adds and deletes from
removes, and the shapes only writer-recorded change data can describe
refuse loudly.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml_to_parquet_spark.sources.delta_log import delta_changes

from tests.test_delta_dv import (  # spec-derived encoders, reused
    _UUID,
    _serialize_treemap,
    _z85_encode,
)


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


def _meta(schema=_SCHEMA_K, part_cols=()):
    return {"metaData": {"id": "cdf-fixture",
                         "format": {"provider": "parquet"},
                         "schemaString": schema,
                         "partitionColumns": list(part_cols),
                         "configuration": {"delta.enableChangeDataFeed": "true"}}}


def _add(path, pv=None, dv=None, data_change=True):
    add = {"path": path, "partitionValues": pv or {}, "size": 1,
           "modificationTime": 0, "dataChange": data_change}
    if dv:
        add["deletionVector"] = dv
    return {"add": add}


def _remove(path, data_change=True):
    return {"remove": {"path": path, "deletionTimestamp": 0,
                       "dataChange": data_change}}


def _inline_dv(positions):
    blob = _serialize_treemap(positions)
    return {"storageType": "i", "pathOrInlineDv": _z85_encode(blob),
            "sizeInBytes": len(blob), "cardinality": len(positions)}


@pytest.fixture(scope="module")
def cdf_table(tmp_path_factory):
    """v0: add f0 (k=0..4). v1: append f1 (k=5..7), no cdc -> synthesized
    inserts. v2: an UPDATE commit described by a cdc file (k=0 preimage
    -> k=100 postimage) whose remove/re-add of f0 must NOT also count.
    v3: delete f1, no cdc -> synthesized deletes, commitInfo timestamp."""
    table = str(tmp_path_factory.mktemp("cdf"))
    pq.write_table(pa.table({"k": list(range(5))}),
                   os.path.join(table, "f0.parquet"))
    pq.write_table(pa.table({"k": [5, 6, 7]}),
                   os.path.join(table, "f1.parquet"))
    pq.write_table(pa.table({"k": [100, 1, 2, 3, 4]}),
                   os.path.join(table, "f0b.parquet"))
    os.makedirs(os.path.join(table, "_change_data"))
    pq.write_table(
        pa.table({"k": [0, 100],
                  "_change_type": ["update_preimage", "update_postimage"]}),
        os.path.join(table, "_change_data", "cdc-v2.parquet"),
    )
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        _meta(),
        _add("f0.parquet"),
    ])
    _commit(table, 1, [_add("f1.parquet")])
    _commit(table, 2, [
        {"cdc": {"path": "_change_data/cdc-v2.parquet",
                 "partitionValues": {}, "size": 1, "dataChange": False}},
        _remove("f0.parquet"),
        _add("f0b.parquet"),
    ])
    _commit(table, 3, [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "DELETE"}},
        _remove("f1.parquet"),
    ])
    return table


def _changes(df):
    return {(r["k"], r["_change_type"], r["_commit_version"])
            for r in df.collect()}


def test_full_window_change_set(spark, cdf_table):
    got = _changes(delta_changes(spark, cdf_table, 0, 3))
    assert got == {
        (5, "insert", 1), (6, "insert", 1), (7, "insert", 1),
        (0, "update_preimage", 2), (100, "update_postimage", 2),
        (5, "delete", 3), (6, "delete", 3), (7, "delete", 3),
    }


def test_cdc_commit_is_exactly_its_cdc_files(spark, cdf_table):
    """The remove+re-add of f0 in v2 must contribute NOTHING beyond the
    cdc rows — using the file actions too would fabricate 10 changes."""
    got = _changes(delta_changes(spark, cdf_table, 1, 2))
    assert got == {(0, "update_preimage", 2), (100, "update_postimage", 2)}


def test_window_slicing_matches_union(spark, cdf_table):
    lo = _changes(delta_changes(spark, cdf_table, 0, 1))
    hi = _changes(delta_changes(spark, cdf_table, 1, 3))
    assert lo | hi == _changes(delta_changes(spark, cdf_table, 0, 3))
    assert lo == {(5, "insert", 1), (6, "insert", 1), (7, "insert", 1)}


def test_commit_timestamp_from_commit_info(spark, cdf_table):
    rows = delta_changes(spark, cdf_table, 2, 3).collect()
    assert {r["_commit_version"] for r in rows} == {3}
    ts = {r["_commit_timestamp"] for r in rows}
    assert len(ts) == 1
    assert next(iter(ts)).year == 2023  # 1700000000000 ms epoch
    # v1 had no commitInfo: its timestamp is null
    v1 = delta_changes(spark, cdf_table, 0, 1).collect()
    assert {r["_commit_timestamp"] for r in v1} == {None}


def test_columns_and_empty_window(spark, cdf_table):
    df = delta_changes(spark, cdf_table, 0, 3)
    assert set(df.columns) == {"k", "_change_type", "_commit_version",
                               "_commit_timestamp"}
    empty = delta_changes(spark, cdf_table, 3, 3)
    assert empty.count() == 0
    assert set(empty.columns) == set(df.columns)


def test_unretained_window_refused(spark, cdf_table, tmp_path):
    import shutil

    table = str(tmp_path / "gone")
    shutil.copytree(cdf_table, table)
    # checkpoint at 2 so version 2 stays readable, then clean 0-2
    rows = [{"add": {"path": p, "size": 1, "dataChange": True}}
            for p in ("f0b.parquet", "f1.parquet")]
    rows.append({"add": None,
                 "metaData": {"id": "cdf-fixture",
                              "format": {"provider": "parquet"},
                              "schemaString": _SCHEMA_K,
                              "partitionColumns": []}})
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(table, "_delta_log",
                     "00000000000000000002.checkpoint.parquet"),
    )
    for v in (0, 1, 2):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    with pytest.raises(ValueError, match="not readable"):
        delta_changes(spark, table, 0, 3)
    # but the checkpoint-seeded base still serves the tail window
    got = _changes(delta_changes(spark, table, 2, 3))
    assert got == {(5, "delete", 3), (6, "delete", 3), (7, "delete", 3)}
    # a missing JSON inside an explicitly requested window is the
    # per-version-facts refusal, even though the base is readable
    os.remove(os.path.join(table, "_delta_log", f"{3:020d}.json"))
    with pytest.raises(ValueError, match="not retained"):
        delta_changes(spark, table, 2, 3)


def test_dv_rewrite_without_cdc_refused(spark, tmp_path):
    table = str(tmp_path)
    pq.write_table(pa.table({"k": [0, 1, 2]}),
                   os.path.join(table, "f.parquet"))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(),
        _add("f.parquet"),
    ])
    _commit(table, 1, [
        _remove("f.parquet"),
        _add("f.parquet", dv=_inline_dv([1])),
    ])
    with pytest.raises(ValueError, match="no cdc files"):
        delta_changes(spark, table, 0, 1)


def test_synthesized_delete_respects_prior_dv(spark, tmp_path):
    """f is rewritten with a DV via a cdc-described commit (v1), then
    fully removed with no cdc (v2): the synthesized deletes must be the
    LIVE rows only — re-deleting the DV'd row would fabricate a change."""
    table = str(tmp_path)
    pq.write_table(pa.table({"k": [0, 1, 2]}),
                   os.path.join(table, "f.parquet"))
    os.makedirs(os.path.join(table, "_change_data"))
    pq.write_table(
        pa.table({"k": [1], "_change_type": ["delete"]}),
        os.path.join(table, "_change_data", "cdc-v1.parquet"),
    )
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(),
        _add("f.parquet"),
    ])
    _commit(table, 1, [
        {"cdc": {"path": "_change_data/cdc-v1.parquet",
                 "partitionValues": {}, "size": 1, "dataChange": False}},
        _remove("f.parquet"),
        _add("f.parquet", dv=_inline_dv([1])),
    ])
    _commit(table, 2, [_remove("f.parquet")])
    got = _changes(delta_changes(spark, table, 0, 2))
    assert got == {(1, "delete", 1),
                   (0, "delete", 2), (2, "delete", 2)}


def test_schema_change_in_window_refused(spark, tmp_path):
    table = str(tmp_path)
    pq.write_table(pa.table({"k": [0]}), os.path.join(table, "f.parquet"))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        _meta(),
        _add("f.parquet"),
    ])
    two_col = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ]})
    _commit(table, 1, [_meta(schema=two_col)])
    with pytest.raises(ValueError, match="schema"):
        delta_changes(spark, table, 0, 1)


def test_partitioned_cdf(spark, tmp_path):
    """Synthesized changes and cdc rows both carry their log-borne
    partition values as typed literals."""
    table = str(tmp_path)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {}},
    ]})
    os.makedirs(os.path.join(table, "p=a"))
    os.makedirs(os.path.join(table, "_change_data", "p=b"))
    pq.write_table(pa.table({"k": [0, 1]}),
                   os.path.join(table, "p=a", "f0.parquet"))
    pq.write_table(
        pa.table({"k": [10], "_change_type": ["insert"]}),
        os.path.join(table, "_change_data", "p=b", "cdc-v2.parquet"),
    )
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        _meta(schema=schema, part_cols=["p"]),
    ])
    _commit(table, 1, [_add("p=a/f0.parquet", pv={"p": "a"})])
    _commit(table, 2, [
        {"cdc": {"path": "_change_data/p=b/cdc-v2.parquet",
                 "partitionValues": {"p": "b"}, "size": 1,
                 "dataChange": False}},
    ])
    got = {(r["k"], r["p"], r["_change_type"], r["_commit_version"])
           for r in delta_changes(spark, table, 0, 2).collect()}
    assert got == {(0, "a", "insert", 1), (1, "a", "insert", 1),
                   (10, "b", "insert", 2)}


def test_compaction_contributes_nothing(spark, tmp_path):
    table = str(tmp_path)
    pq.write_table(pa.table({"k": [0, 1]}), os.path.join(table, "f.parquet"))
    pq.write_table(pa.table({"k": [0, 1]}), os.path.join(table, "g.parquet"))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        _meta(),
        _add("f.parquet"),
    ])
    _commit(table, 1, [
        _remove("f.parquet", data_change=False),
        _add("g.parquet", data_change=False),
    ])
    assert delta_changes(spark, table, 0, 1).count() == 0


def test_base_version_must_be_readable(spark, cdf_table):
    with pytest.raises(ValueError, match="not readable"):
        delta_changes(spark, cdf_table, 99, None)


def test_cdf_under_column_mapping(spark, tmp_path):
    """cdc files in a column-mapped table store PHYSICAL column names
    (plus the literal _change_type, which is never mapped): the change
    frame must come back in logical vocabulary."""
    table = str(tmp_path)
    cm_schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-xyz",
                          "delta.columnMapping.id": 1}},
        ],
    })
    meta = {"metaData": {"id": "cm-cdf", "format": {"provider": "parquet"},
                         "schemaString": cm_schema, "partitionColumns": [],
                         "configuration": {
                             "delta.columnMapping.mode": "name",
                             "delta.enableChangeDataFeed": "true"}}}
    pq.write_table(pa.table({"col-xyz": [1, 2]}),
                   os.path.join(table, "f.parquet"))
    os.makedirs(os.path.join(table, "_change_data"))
    pq.write_table(
        pa.table({"col-xyz": [2, 20],
                  "_change_type": ["update_preimage", "update_postimage"]}),
        os.path.join(table, "_change_data", "cdc-v1.parquet"),
    )
    pq.write_table(pa.table({"col-xyz": [1, 20]}),
                   os.path.join(table, "g.parquet"))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
        _add("f.parquet"),
    ])
    _commit(table, 1, [
        {"cdc": {"path": "_change_data/cdc-v1.parquet",
                 "partitionValues": {}, "size": 1, "dataChange": False}},
        _remove("f.parquet"),
        _add("g.parquet"),
    ])
    got = {(r["k"], r["_change_type"], r["_commit_version"])
           for r in delta_changes(spark, table, 0, 1).collect()}
    assert got == {(2, "update_preimage", 1), (20, "update_postimage", 1)}
