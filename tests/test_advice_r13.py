"""Round-13 ADVICE closures (ADVICE.md, r12 advisor — all three on the
Delta log adapter, sources/delta_log.py):

1. A corrupt or empty `_last_checkpoint` (a torn write from a crashed
   writer) no longer crashes any read. The closure then GENERALIZED
   mid-r13: multi-part checkpoints became supported (seeded from the
   listing, completeness verified there), which removed the hint's only
   consumer — the adapter now never opens `_last_checkpoint` at all, so
   every hint failure mode (corrupt, stale, dangling, adversarial) is
   structurally inert rather than defensively handled.
2. Null partition values have three raw encodings (missing key, JSON
   null, "" — Delta's canonical string encoding) that different writers
   mix freely; grouping and partition_filter now normalize all three to
   one canonical null marker, so null-partition files form ONE group and
   partition_filter={"col": ""} matches them whichever encoding their
   writer chose.
3. A stats_filter/partition_filter that legitimately matches zero files
   returns an EMPTY DataFrame under the declared metaData.schemaString
   (the same contract as the equivalent .filter()), instead of turning a
   pure work-skipping optimization into a ValueError; the error remains
   only on the schema-inference fallback path, where an empty scan
   genuinely has no schema.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml_to_parquet_spark.sources.delta_log import (
    list_delta_versions,
    read_delta_snapshot,
)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _add(path, pv=None, stats=None):
    add = {
        "path": path,
        "partitionValues": {} if pv is None else pv,
        "size": 1,
        "modificationTime": 0,
        "dataChange": True,
    }
    if stats is not None:
        add["stats"] = json.dumps(stats)
    return {"add": add}


_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "region", "type": "string", "nullable": True,
         "metadata": {}},
    ],
})


def _meta(part_cols):
    return {"metaData": {"id": "advice13", "format": {"provider": "parquet"},
                         "schemaString": _SCHEMA,
                         "partitionColumns": part_cols,
                         "configuration": {}}}


@pytest.fixture()
def healthy_table(tmp_path):
    table = str(tmp_path / "healthy")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "f.parquet"))
    _commit(table, 0, [_meta([]), _add("f.parquet")])
    return table


# ---------------------------------------------------------------------------
# 1. corrupt/empty _last_checkpoint hint
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("payload", [b"", b"{truncated", b"\x00\x01"])
def test_corrupt_last_checkpoint_hint_treated_as_absent(
    spark, healthy_table, payload
):
    """A torn hint write must not fail reads on an otherwise healthy
    table — the listing stays authoritative."""
    hint = os.path.join(healthy_table, "_delta_log", "_last_checkpoint")
    with open(hint, "wb") as fh:
        fh.write(payload)
    assert list_delta_versions(healthy_table) == [0]
    assert read_delta_snapshot(spark, healthy_table).count() == 1


def test_any_hint_content_is_inert(spark, healthy_table):
    """The closure generalized mid-r13: multi-part checkpoints became
    SUPPORTED (seeded from the listing with completeness verified
    there), so `_last_checkpoint` lost its only consumer — ANY hint
    content, parseable or not, changes nothing about a read."""
    hint = os.path.join(healthy_table, "_delta_log", "_last_checkpoint")
    with open(hint, "w") as fh:
        json.dump({"version": 99, "size": 2, "parts": 7}, fh)
    assert list_delta_versions(healthy_table) == [0]
    assert read_delta_snapshot(spark, healthy_table).count() == 1


# ---------------------------------------------------------------------------
# 2. null partition-value encodings unify
# ---------------------------------------------------------------------------


@pytest.fixture()
def mixed_null_table(tmp_path):
    """Three writers, three null encodings for the SAME null partition:
    "" (canonical), missing key, JSON null — plus one non-null group."""
    table = str(tmp_path / "nulls")
    os.makedirs(table, exist_ok=True)
    for name, k in [("a.parquet", 1), ("b.parquet", 2),
                    ("c.parquet", 3), ("d.parquet", 4)]:
        pq.write_table(pa.Table.from_pylist([{"k": k}]),
                       os.path.join(table, name))
    _commit(table, 0, [
        _meta(["region"]),
        _add("a.parquet", pv={"region": ""}),        # canonical ""
        _add("b.parquet", pv={}),                    # missing key
        _add("c.parquet", pv={"region": None}),      # JSON null
        _add("d.parquet", pv={"region": "emea"}),
    ])
    return table


def test_null_partition_encodings_form_one_group(spark, mixed_null_table):
    df = read_delta_snapshot(spark, mixed_null_table)
    got = {(r["k"], r["region"]) for r in df.collect()}
    assert got == {(1, None), (2, None), (3, None), (4, "emea")}


@pytest.mark.parametrize("null_repr", ["", None])
def test_partition_filter_matches_every_null_encoding(
    spark, mixed_null_table, null_repr
):
    """partition_filter with either null spelling ("" or None) matches
    ALL null-encoded files, not just the ""-encoded one."""
    df = read_delta_snapshot(spark, mixed_null_table,
                             partition_filter={"region": null_repr})
    assert {r["k"] for r in df.collect()} == {1, 2, 3}


# ---------------------------------------------------------------------------
# 3. zero-match filters return an empty typed DataFrame when the schema
#    is declared; the inference fallback still refuses
# ---------------------------------------------------------------------------


def test_partition_filter_zero_match_returns_empty_typed(
    spark, mixed_null_table
):
    df = read_delta_snapshot(spark, mixed_null_table,
                             partition_filter={"region": "mars"})
    assert df.count() == 0
    assert dict(df.dtypes) == {"k": "bigint", "region": "string"}
    # composes with downstream plan building exactly like .filter()
    assert df.where("k > 0").count() == 0


def test_stats_filter_zero_match_returns_empty_typed(spark, tmp_path):
    table = str(tmp_path / "allstats")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "only.parquet"))
    _commit(table, 0, [
        _meta([]),
        _add("only.parquet",
             stats={"numRecords": 1, "minValues": {"k": 1},
                    "maxValues": {"k": 1}}),
    ])
    df = read_delta_snapshot(spark, table, stats_filter=[("k", ">", 5)])
    assert df.count() == 0
    assert dict(df.dtypes) == {"k": "bigint", "region": "string"}


def test_zero_match_without_schema_string_still_refused(spark, tmp_path):
    """The schema-inference fallback genuinely cannot represent an empty
    scan — the original error is the right behavior THERE."""
    table = str(tmp_path / "noschema")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "only.parquet"))
    _commit(table, 0, [
        {"metaData": {"id": "bare", "format": {"provider": "parquet"},
                      "partitionColumns": [], "configuration": {}}},
        _add("only.parquet",
             stats={"numRecords": 1, "minValues": {"k": 1},
                    "maxValues": {"k": 1}}),
    ])
    with pytest.raises(ValueError, match="prunes every file"):
        read_delta_snapshot(spark, table, stats_filter=[("k", ">", 5)])
