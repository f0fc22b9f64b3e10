"""Read-only Delta Lake log adapter (VERDICT r11 #7 — start the real
table-format story cheaply): the fixture below is GENUINE Delta protocol
bytes — pyarrow-written parquet data files plus hand-written
`_delta_log/NNN.json` commits per delta-io PROTOCOL.md — and the adapter
must reproduce the exact snapshot-isolation semantics the hand-rolled
lake_snapshot_read models: a version is its replayed file list, appends
never disturb old snapshots, removes are logical (files stay on disk for
history), and the scan is an ordinary pushdown-capable parquet read.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml_to_parquet_spark.sources.delta_log import (
    delta_active_files,
    list_delta_versions,
    read_delta_snapshot,
)



def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _add(path, size=1):
    return {
        "add": {
            "path": path,
            "partitionValues": {},
            "size": size,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _remove(path):
    return {"remove": {"path": path, "deletionTimestamp": 0, "dataChange": True}}


@pytest.fixture(scope="module")
def orders_pd(sf_dir):
    return pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )


@pytest.fixture(scope="module")
def split(orders_pd):
    """Data-derived o_orderkey split between commit 0 and the commit-1
    append — SF-independent (sf0.001 keys top out below 3000)."""
    s = int(orders_pd["o_orderkey"].median())
    assert (orders_pd["o_orderkey"] < s).any()
    assert (orders_pd["o_orderkey"] >= s).any()
    return s


@pytest.fixture(scope="module")
def delta_table(tmp_path_factory, orders_pd, split):
    """Three commits: 0 = two files below the split, 1 = append of the rest,
    2 = compaction (remove one v0 file, re-add its rows as a new file)."""
    table = str(tmp_path_factory.mktemp("delta_orders"))
    low = orders_pd[orders_pd["o_orderkey"] < split]
    half = low["o_orderkey"].median()
    parts = {
        "part-0000.parquet": low[low["o_orderkey"] <= half],
        "part-0001.parquet": low[low["o_orderkey"] > half],
        "part-0002.parquet": orders_pd[orders_pd["o_orderkey"] >= split],
        "part-0000-compacted.parquet": low[low["o_orderkey"] <= half],
    }
    for name, pdf in parts.items():
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(table, name))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "fixture", "format": {"provider": "parquet"},
                      "partitionColumns": [], "configuration": {}}},
        _add("part-0000.parquet"),
        _add("part-0001.parquet"),
    ])
    _commit(table, 1, [_add("part-0002.parquet")])
    _commit(table, 2, [
        _remove("part-0000.parquet"),
        _add("part-0000-compacted.parquet"),
    ])
    return table


def _keyset(df):
    return {r["o_orderkey"] for r in df.select("o_orderkey").collect()}


def test_versions_listed(delta_table):
    assert list_delta_versions(delta_table) == [0, 1, 2]


def test_snapshot_v0_is_pre_append_state(spark, delta_table, orders_pd, split):
    got = _keyset(read_delta_snapshot(spark, delta_table, 0))
    assert got == set(orders_pd[orders_pd["o_orderkey"] < split]["o_orderkey"])


def test_snapshot_v1_sees_the_append(spark, delta_table, orders_pd):
    got = _keyset(read_delta_snapshot(spark, delta_table, 1))
    assert got == set(orders_pd["o_orderkey"])


def test_compaction_preserves_content_and_latest_is_default(
    spark, delta_table, orders_pd
):
    """v2 swaps a file for its rewritten copy: file SET changes, content
    must not; version=None resolves to the latest commit."""
    v2 = read_delta_snapshot(spark, delta_table, 2)
    assert _keyset(v2) == set(orders_pd["o_orderkey"])
    latest = read_delta_snapshot(spark, delta_table)
    assert _keyset(latest) == _keyset(v2)
    files2 = set(delta_active_files(delta_table, 2))
    files1 = set(delta_active_files(delta_table, 1))
    assert files1 != files2
    assert any(f.endswith("part-0000-compacted.parquet") for f in files2)
    assert not any(f.endswith("part-0000.parquet") for f in files2)


def test_old_snapshot_isolated_from_later_commits(spark, delta_table):
    """The lake_snapshot_read semantic on the real protocol: reading v0
    AFTER commits 1 and 2 landed returns the v0 file list — the removed
    file is still on disk and still served for history."""
    files0 = delta_active_files(delta_table, 0)
    assert [os.path.basename(f) for f in files0] == [
        "part-0000.parquet", "part-0001.parquet",
    ]
    assert all(os.path.exists(f) for f in files0)


def test_aggregate_parity_with_snapshot_oracle(spark, delta_table, orders_pd, split):
    """Same aggregate shape as lake_snapshot_read's oracle, recomputed
    from the key-split definition: a leaked post-commit file or a lost
    committed one breaks value parity, not just row counts."""
    from pyspark.sql import functions as F

    for version, pdf in [
        (0, orders_pd[orders_pd["o_orderkey"] < split]),
        (1, orders_pd),
        (2, orders_pd),
    ]:
        row = (
            read_delta_snapshot(spark, delta_table, version)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"),
                F.max("o_orderkey").alias("mk"),
            )
            .collect()[0]
        )
        assert row["n"] == len(pdf)
        assert row["c"] == int(round(pdf["o_totalprice"] * 100).sum())
        assert row["mk"] == pdf["o_orderkey"].max()


def test_snapshot_scan_is_pushdown_capable(spark, delta_table):
    """The adapter must yield an ordinary parquet FileScan — filters
    reach the scan as PushedFilters exactly as on a native table."""
    df = read_delta_snapshot(spark, delta_table, 1).filter(
        "o_orderkey < 100"
    ).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)" in plan
    assert "ReadSchema: struct<o_orderkey" in plan


def test_log_failure_modes(spark, delta_table, tmp_path):
    with pytest.raises(FileNotFoundError):
        list_delta_versions(str(tmp_path / "not_a_table"))
    with pytest.raises(ValueError, match="not in Delta log"):
        read_delta_snapshot(spark, delta_table, 99)
    # a hole in the version sequence must refuse to replay
    holey = str(tmp_path / "holey")
    _commit(holey, 0, [_add("x.parquet")])
    _commit(holey, 2, [_add("y.parquet")])
    with pytest.raises(ValueError, match="non-contiguous"):
        list_delta_versions(holey)
