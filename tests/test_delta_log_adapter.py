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


# ---------------------------------------------------------------------------
# checkpoint parquet files + log retention (the long-lived-table path)
# ---------------------------------------------------------------------------


def _write_checkpoint(table, version, active_paths, tombstones=()):
    """Single-part checkpoint per PROTOCOL.md: one action per row, the
    non-null `add` rows being exactly the version's active file set;
    `remove` rows are VACUUM tombstones a snapshot reader must ignore."""
    rows = [
        {"add": {"path": p, "size": 1, "dataChange": True},
         "remove": None, "protocol": None}
        for p in active_paths
    ]
    rows += [
        {"add": None, "remove": {"path": p, "deletionTimestamp": 0},
         "protocol": None}
        for p in tombstones
    ]
    rows.append({"add": None, "remove": None,
                 "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(table, "_delta_log",
                     f"{version:020d}.checkpoint.parquet"),
    )


def _build_four_commit_table(root):
    """Commits: 0 adds f0+f1, 1 adds f2, 2 removes f0 / adds f3,
    3 removes f1. Key ranges: f_i holds {2i, 2i+1}."""
    table = str(root)
    os.makedirs(table, exist_ok=True)
    for i in range(4):
        pq.write_table(
            pa.Table.from_pylist([{"k": 2 * i}, {"k": 2 * i + 1}]),
            os.path.join(table, f"f{i}.parquet"),
        )
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "cp-fixture", "format": {"provider": "parquet"},
                      "partitionColumns": [], "configuration": {}}},
        _add("f0.parquet"), _add("f1.parquet"),
    ])
    _commit(table, 1, [_add("f2.parquet")])
    _commit(table, 2, [_remove("f0.parquet"), _add("f3.parquet")])
    _commit(table, 3, [_remove("f1.parquet")])
    return table


@pytest.fixture()
def cp_table(tmp_path):
    """The four-commit table with a checkpoint at v2 (tombstone for the
    removed f0, as real writers emit) and commits 0-1 CLEANED — the
    normal log-retention state of any long-lived Delta table."""
    table = _build_four_commit_table(tmp_path / "cp")
    _write_checkpoint(table, 2,
                      ["f1.parquet", "f2.parquet", "f3.parquet"],
                      tombstones=["f0.parquet"])
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    return table


def _basenames(files):
    return {os.path.basename(f) for f in files}


def test_checkpoint_seed_matches_pure_json_replay(tmp_path):
    """On a table that still has its full JSON log, adding a checkpoint
    must not change any snapshot — seeded replay ≡ from-zero replay."""
    twin = _build_four_commit_table(tmp_path / "json_only")
    cp = _build_four_commit_table(tmp_path / "with_cp")
    _write_checkpoint(cp, 2, ["f1.parquet", "f2.parquet", "f3.parquet"],
                      tombstones=["f0.parquet"])
    for v in (2, 3):
        assert _basenames(delta_active_files(cp, v)) == _basenames(
            delta_active_files(twin, v)
        )


def test_log_cleaned_table_reads_from_checkpoint(spark, cp_table):
    """With commits 0-1 gone the checkpoint is the ONLY seed: versions
    2..3 stay readable and correct, proving the seed path is real."""
    assert list_delta_versions(cp_table) == [2, 3]
    assert _basenames(delta_active_files(cp_table, 2)) == {
        "f1.parquet", "f2.parquet", "f3.parquet"
    }
    got = {r["k"] for r in read_delta_snapshot(spark, cp_table, 3).collect()}
    assert got == {4, 5, 6, 7}


def test_versions_before_oldest_seed_are_refused(cp_table):
    """Time travel below the retained history must refuse, not guess."""
    with pytest.raises(ValueError, match="not in Delta log"):
        delta_active_files(cp_table, 1)


def test_checkpoint_tombstones_are_not_active(cp_table):
    """The v2 checkpoint carries f0's remove tombstone; a snapshot read
    must treat it as bookkeeping, never as an active file."""
    assert "f0.parquet" not in _basenames(delta_active_files(cp_table, 2))


def test_hole_after_checkpoint_still_refused(tmp_path):
    """A checkpoint excuses missing history BEFORE it, never a hole in
    the tail after it."""
    table = str(tmp_path / "holey_tail")
    os.makedirs(os.path.join(table, "_delta_log"))
    pq.write_table(pa.Table.from_pylist([{"k": 0}]),
                   os.path.join(table, "x.parquet"))
    _write_checkpoint(table, 2, ["x.parquet"])
    _commit(table, 4, [_add("x.parquet")])  # v3 missing
    with pytest.raises(ValueError, match="non-contiguous"):
        list_delta_versions(table)


def test_stale_last_checkpoint_hint_tolerated(cp_table):
    """_last_checkpoint is a listing hint; one that lags the log (or even
    dangles) must not mask newer commits."""
    with open(os.path.join(cp_table, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        json.dump({"version": 2, "size": 5}, fh)
    assert list_delta_versions(cp_table) == [2, 3]


def _write_multipart_checkpoint(table, version, active_paths, n_parts,
                                tombstones=()):
    """Complete multi-part checkpoint per PROTOCOL.md
    (`<v>.checkpoint.<i>.<n>.parquet`): the action rows PARTITIONED
    round-robin across n parts — one part is NOT a snapshot, their
    union is. metaData lands in whichever part the round-robin drops it
    (real writers scatter it into an arbitrary part)."""
    rows = [
        {"add": {"path": p, "size": 1, "dataChange": True},
         "remove": None, "metaData": None}
        for p in active_paths
    ]
    rows += [
        {"add": None, "remove": {"path": p, "deletionTimestamp": 0},
         "metaData": None}
        for p in tombstones
    ]
    rows.append({"add": None, "remove": None,
                 "metaData": {"id": "cp-fixture",
                              "partitionColumns": []}})
    parts = [rows[i::n_parts] for i in range(n_parts)]
    for i, part_rows in enumerate(parts, start=1):
        pq.write_table(
            pa.Table.from_pylist(part_rows),
            os.path.join(
                table, "_delta_log",
                f"{version:020d}.checkpoint.{i:010d}.{n_parts:010d}.parquet",
            ),
        )


@pytest.fixture()
def multipart_cp_table(tmp_path):
    """The four-commit table with a COMPLETE 3-part checkpoint at v2 and
    commits 0-1 cleaned — the log-retention state of a large table whose
    checkpoint outgrew one file."""
    table = _build_four_commit_table(tmp_path / "mpcp")
    _write_multipart_checkpoint(
        table, 2, ["f1.parquet", "f2.parquet", "f3.parquet"], 3,
        tombstones=["f0.parquet"],
    )
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    return table


def test_multipart_checkpoint_seeds_replay(spark, multipart_cp_table):
    """A complete multi-part set is a first-class seed: the log-cleaned
    table reads exactly like its single-part twin."""
    assert list_delta_versions(multipart_cp_table) == [2, 3]
    assert _basenames(delta_active_files(multipart_cp_table, 2)) == {
        "f1.parquet", "f2.parquet", "f3.parquet",
    }
    got = {r["k"] for r in
           read_delta_snapshot(spark, multipart_cp_table, 3).collect()}
    assert got == {4, 5, 6, 7}  # f2 + f3 after v3 removed f1


def test_multipart_matches_single_part_and_pure_json(tmp_path):
    """Three tables, same commits: full-JSON replay, single-part seed,
    multi-part seed — every snapshot's file set must be identical."""
    json_only = _build_four_commit_table(tmp_path / "json_only")
    single = _build_four_commit_table(tmp_path / "single")
    _write_checkpoint(single, 2, ["f1.parquet", "f2.parquet", "f3.parquet"],
                      tombstones=["f0.parquet"])
    multi = _build_four_commit_table(tmp_path / "multi")
    _write_multipart_checkpoint(
        multi, 2, ["f1.parquet", "f2.parquet", "f3.parquet"], 2,
        tombstones=["f0.parquet"],
    )
    for v in (2, 3):
        want = _basenames(delta_active_files(json_only, v))
        assert _basenames(delta_active_files(single, v)) == want
        assert _basenames(delta_active_files(multi, v)) == want


def test_incomplete_multipart_set_is_never_a_seed(tmp_path):
    """A torn multi-part write (part 2 of 3 missing — a concurrent
    writer mid-checkpoint, or a partial upload): the set must not seed.
    With the JSON log intact the replay reads AROUND it from commit 0;
    with the log cleaned the affected versions are refused, never
    silently served from a partial state."""
    table = _build_four_commit_table(tmp_path / "torn")
    _write_multipart_checkpoint(
        table, 2, ["f1.parquet", "f2.parquet", "f3.parquet"], 3,
        tombstones=["f0.parquet"],
    )
    os.remove(os.path.join(
        table, "_delta_log",
        f"{2:020d}.checkpoint.{2:010d}.{3:010d}.parquet",
    ))
    # full JSON retained: read-around — all four versions replay from 0
    assert list_delta_versions(table) == [0, 1, 2, 3]
    assert _basenames(delta_active_files(table, 3)) == {
        "f2.parquet", "f3.parquet",
    }
    # log cleaned below the torn checkpoint: the latest version has no
    # replay path — refuse, don't guess
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    with pytest.raises(ValueError, match="non-contiguous"):
        list_delta_versions(table)


def test_multipart_hint_is_ignored_not_refused(cp_table):
    """`_last_checkpoint` declaring parts is no longer a refusal: the
    hint has NO consumer (completeness is verified from the listing), so
    even a hint describing a checkpoint that does not exist changes
    nothing."""
    with open(os.path.join(cp_table, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        json.dump({"version": 2, "size": 5, "parts": 2}, fh)
    assert list_delta_versions(cp_table) == [2, 3]


# ---------------------------------------------------------------------------
# partitioned tables — partition values live in the LOG, not the data files
# ---------------------------------------------------------------------------

_PART_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "region", "type": "string", "nullable": True, "metadata": {}},
        {"name": "year", "type": "integer", "nullable": True, "metadata": {}},
    ],
})


def _add_part(path, pv):
    a = _add(path)
    a["add"]["partitionValues"] = pv
    return a


@pytest.fixture()
def part_table(tmp_path):
    """Two partition columns (region: string, year: int). The DATA files
    hold only `k` — a reader that ignores add.partitionValues returns a
    table with the partition columns silently missing."""
    table = str(tmp_path / "part")
    os.makedirs(table, exist_ok=True)
    for name, ks in [("pa.parquet", [1, 2]), ("pb.parquet", [3]),
                     ("pc.parquet", [4, 5]), ("pd.parquet", [6])]:
        pq.write_table(pa.Table.from_pylist([{"k": k} for k in ks]),
                       os.path.join(table, name))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "part-fixture",
                      "format": {"provider": "parquet"},
                      "schemaString": _PART_SCHEMA,
                      "partitionColumns": ["region", "year"],
                      "configuration": {}}},
        _add_part("pa.parquet", {"region": "emea", "year": "2024"}),
        _add_part("pb.parquet", {"region": "emea", "year": "2025"}),
        _add_part("pc.parquet", {"region": "apac", "year": "2024"}),
    ])
    _commit(table, 1, [_add_part("pd.parquet", {"region": "", "year": "2025"})])
    return table


def test_partition_columns_attached_and_typed(spark, part_table):
    df = read_delta_snapshot(spark, part_table)
    assert dict(df.dtypes)["region"] == "string"
    assert dict(df.dtypes)["year"] == "int"
    got = {(r["k"], r["region"], r["year"]) for r in df.collect()}
    assert got == {
        (1, "emea", 2024), (2, "emea", 2024), (3, "emea", 2025),
        (4, "apac", 2024), (5, "apac", 2024),
        (6, None, 2025),  # "" is Delta's null encoding
    }


def test_partition_isolation_across_versions(spark, part_table):
    """v0 predates the null-region append — its groups only."""
    got = {(r["k"], r["region"]) for r in
           read_delta_snapshot(spark, part_table, 0).collect()}
    assert got == {(1, "emea"), (2, "emea"), (3, "emea"),
                   (4, "apac"), (5, "apac")}


def test_partition_filter_prunes_driver_side(spark, part_table):
    """The filter must cut whole partition groups BEFORE any scan exists:
    the pruned plan's FileScan lists only the matching files."""
    df = read_delta_snapshot(spark, part_table,
                             partition_filter={"region": "emea",
                                               "year": "2024"})
    assert {r["k"] for r in df.collect()} == {1, 2}
    scanned = {os.path.basename(f) for f in df.inputFiles()}
    assert scanned == {"pa.parquet"}


def test_partition_filter_failure_modes(spark, part_table, tmp_path):
    with pytest.raises(ValueError, match="not partition"):
        read_delta_snapshot(spark, part_table,
                            partition_filter={"nope": "1"})
    # a filter matching zero partitions is an empty RESULT (the schema is
    # declared in metaData), not an error — ADVICE r12, same contract as
    # the equivalent .filter(); pinned further in tests/test_advice_r13.py
    empty = read_delta_snapshot(spark, part_table,
                                partition_filter={"region": "mars"})
    assert empty.count() == 0
    assert dict(empty.dtypes) == {"k": "bigint", "region": "string",
                                  "year": "int"}
    # unpartitioned table + a filter is a caller bug, not an empty result
    flat = str(tmp_path / "flat")
    os.makedirs(flat, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 0}]),
                   os.path.join(flat, "f.parquet"))
    _commit(flat, 0, [_add("f.parquet")])
    with pytest.raises(ValueError, match="unpartitioned"):
        read_delta_snapshot(spark, flat, partition_filter={"region": "x"})


def test_partition_values_without_metadata_refused(spark, tmp_path):
    """partitionValues present but the retained log never declared
    partitionColumns: reading would silently drop columns — refuse."""
    table = str(tmp_path / "nometa")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 0}]),
                   os.path.join(table, "f.parquet"))
    _commit(table, 0, [_add_part("f.parquet", {"region": "emea"})])
    with pytest.raises(ValueError, match="partitionValues"):
        read_delta_snapshot(spark, table)


def test_partitioned_checkpoint_roundtrips_partition_values(spark, tmp_path):
    """A checkpoint must carry partitionValues and metaData through the
    seeded path: clean the JSON prefix and the partitioned read still
    reconstructs columns (map<string,string> through real parquet)."""
    table = str(tmp_path / "part_cp")
    os.makedirs(table, exist_ok=True)
    for name, ks in [("x.parquet", [1]), ("y.parquet", [2])]:
        pq.write_table(pa.Table.from_pylist([{"k": k} for k in ks]),
                       os.path.join(table, name))
    meta_row = {"id": "part-cp", "schemaString": _PART_SCHEMA,
                "partitionColumns": ["region", "year"]}
    rows = [
        {"add": {"path": "x.parquet",
                 "partitionValues": [("region", "emea"), ("year", "2024")]},
         "metaData": None},
        {"add": {"path": "y.parquet",
                 "partitionValues": [("region", "apac"), ("year", "2025")]},
         "metaData": None},
        {"add": None, "metaData": meta_row},
    ]
    schema = pa.schema([
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ])),
    ])
    os.makedirs(os.path.join(table, "_delta_log"))
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(table, "_delta_log",
                                f"{3:020d}.checkpoint.parquet"))
    got = {(r["k"], r["region"], r["year"]) for r in
           read_delta_snapshot(spark, table, 3).collect()}
    assert got == {(1, "emea", 2024), (2, "apac", 2025)}


# ---------------------------------------------------------------------------
# add.stats zone-map file skipping + incremental (streaming) consumption
# ---------------------------------------------------------------------------


def _add_stats(path, min_k, max_k, n):
    a = _add(path)
    a["add"]["stats"] = json.dumps({
        "numRecords": n,
        "minValues": {"k": min_k},
        "maxValues": {"k": max_k},
        "nullCount": {"k": 0},
    })
    return a


@pytest.fixture()
def stats_table(tmp_path):
    """Three files with disjoint k ranges and exact per-file stats, plus
    one file with NO stats (an old writer) that pruning must keep."""
    table = str(tmp_path / "stats")
    os.makedirs(table, exist_ok=True)
    ranges = {"s0.parquet": [0, 9], "s1.parquet": [10, 19],
              "s2.parquet": [20, 29]}
    for name, (lo, hi) in ranges.items():
        pq.write_table(pa.Table.from_pylist([{"k": lo}, {"k": hi}]),
                       os.path.join(table, name))
    pq.write_table(pa.Table.from_pylist([{"k": 100}]),
                   os.path.join(table, "nostats.parquet"))
    _commit(table, 0, [
        _add_stats("s0.parquet", 0, 9, 2),
        _add_stats("s1.parquet", 10, 19, 2),
        _add_stats("s2.parquet", 20, 29, 2),
        _add("nostats.parquet"),
    ])
    return table


def test_stats_filter_skips_provably_excluded_files(spark, stats_table):
    """k >= 15 can only live in s1, s2 — and in the stats-less file,
    which MUST survive (keep-on-missing is the soundness rule)."""
    df = read_delta_snapshot(spark, stats_table, stats_filter=[("k", ">=", 15)])
    scanned = {os.path.basename(f) for f in df.inputFiles()}
    assert scanned == {"s1.parquet", "s2.parquet", "nostats.parquet"}
    # the scan is a superset by design; the real predicate still applies
    assert {r["k"] for r in df.filter("k >= 15").collect()} == {19, 20, 29, 100}


def test_stats_filter_equality_and_conjunction(spark, stats_table):
    df = read_delta_snapshot(spark, stats_table, stats_filter=[("k", "=", 12)])
    assert {os.path.basename(f) for f in df.inputFiles()} == {
        "s1.parquet", "nostats.parquet"}
    df = read_delta_snapshot(
        spark, stats_table, stats_filter=[("k", ">", 9), ("k", "<", 20)])
    assert {os.path.basename(f) for f in df.inputFiles()} == {
        "s1.parquet", "nostats.parquet"}


def test_stats_filter_boundary_semantics(spark, stats_table):
    """Strict vs non-strict at an exact file boundary (max(s0) = 9):
    k > 9 may drop s0, k >= 9 may not."""
    gt = read_delta_snapshot(spark, stats_table, stats_filter=[("k", ">", 9)])
    assert "s0.parquet" not in {os.path.basename(f) for f in gt.inputFiles()}
    ge = read_delta_snapshot(spark, stats_table, stats_filter=[("k", ">=", 9)])
    assert "s0.parquet" in {os.path.basename(f) for f in ge.inputFiles()}


def test_stats_filter_failure_modes(spark, stats_table):
    with pytest.raises(ValueError, match="numeric"):
        read_delta_snapshot(spark, stats_table,
                            stats_filter=[("k", "=", "12")])
    with pytest.raises(ValueError, match="op"):
        read_delta_snapshot(spark, stats_table,
                            stats_filter=[("k", "!=", 12)])
    # the stats-less file survives even an impossible predicate —
    # keep-on-missing beats "prunes every file"
    df = read_delta_snapshot(spark, stats_table, stats_filter=[("k", "<", -5)])
    assert {os.path.basename(f) for f in df.inputFiles()} == {"nostats.parquet"}


def test_stats_filter_pruning_everything_is_refused(spark, tmp_path):
    """When every file has stats and the predicate excludes them all, an
    empty scan has no schema — refuse with a clear error."""
    table = str(tmp_path / "allstats")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "only.parquet"))
    _commit(table, 0, [_add_stats("only.parquet", 1, 1, 1)])
    with pytest.raises(ValueError, match="prunes every file"):
        read_delta_snapshot(spark, table, stats_filter=[("k", ">", 5)])


def test_stats_keep_on_missing_column(spark, stats_table):
    """A predicate on a column absent from every stats dict prunes
    nothing."""
    df = read_delta_snapshot(spark, stats_table,
                             stats_filter=[("other", ">", 1e9)])
    assert len(df.inputFiles()) == 4


def test_incremental_files_window(spark, tmp_path):
    """Appends in (since, to] surface once each; dataChange=false
    rewrites (compaction) are invisible; a real delete refuses."""
    table = str(tmp_path / "incr")
    os.makedirs(table, exist_ok=True)
    for i in range(4):
        pq.write_table(pa.Table.from_pylist([{"k": i}]),
                       os.path.join(table, f"g{i}.parquet"))
    _commit(table, 0, [_add("g0.parquet")])
    _commit(table, 1, [_add("g1.parquet")])
    compact_add = _add("g2.parquet")
    compact_add["add"]["dataChange"] = False
    compact_rm = _remove("g0.parquet")
    compact_rm["remove"]["dataChange"] = False
    _commit(table, 2, [compact_rm, compact_add])
    _commit(table, 3, [_add("g3.parquet")])

    from xml_to_parquet_spark.sources.delta_log import delta_incremental_files

    got = delta_incremental_files(table, 0)
    assert [(v, os.path.basename(p)) for v, p in got] == [
        (1, "g1.parquet"), (3, "g3.parquet")]
    assert delta_incremental_files(table, 0, 1) == [
        (1, os.path.join(table, "g1.parquet"))]
    assert delta_incremental_files(table, 3) == []

    _commit(table, 4, [_remove("g1.parquet")])  # dataChange defaults true
    with pytest.raises(ValueError, match="append-only"):
        delta_incremental_files(table, 3)
    # but a window before the delete still works
    assert delta_incremental_files(table, 2, 3) == [
        (3, os.path.join(table, "g3.parquet"))]


def test_incremental_below_retained_history_refused(cp_table):
    """cp_table has JSON only for v3 — an increment from v0 needs the
    cleaned commits and must refuse, not silently skip them."""
    from xml_to_parquet_spark.sources.delta_log import delta_incremental_files

    with pytest.raises(ValueError, match="not retained"):
        delta_incremental_files(cp_table, 0)


# ---------------------------------------------------------------------------
# schema evolution — the table schema is metaData, not a sampled data file
# ---------------------------------------------------------------------------


def _schema_str(fields):
    return json.dumps({"type": "struct", "fields": [
        {"name": n, "type": t, "nullable": True, "metadata": {}}
        for n, t in fields
    ]})


def test_schema_evolution_old_files_read_as_null(spark, tmp_path):
    """Commit 0 writes (k); commit 1 ADDS column v via a new metaData and
    a file that has it. The snapshot must carry v for every row — null
    for pre-evolution files — instead of inheriting whichever file Spark
    happens to sample."""
    table = str(tmp_path / "evolve")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "old.parquet"))
    pq.write_table(pa.Table.from_pylist([{"k": 2, "v": "new"}]),
                   os.path.join(table, "new.parquet"))
    _commit(table, 0, [
        {"metaData": {"id": "e", "partitionColumns": [],
                      "schemaString": _schema_str([("k", "long")])}},
        _add("old.parquet"),
    ])
    _commit(table, 1, [
        {"metaData": {"id": "e", "partitionColumns": [],
                      "schemaString": _schema_str([("k", "long"),
                                                   ("v", "string")])}},
        _add("new.parquet"),
    ])
    df = read_delta_snapshot(spark, table)
    assert dict(df.dtypes) == {"k": "bigint", "v": "string"}
    got = {(r["k"], r["v"]) for r in df.collect()}
    assert got == {(1, None), (2, "new")}
    # time travel BEFORE the evolution serves the old schema
    v0 = read_delta_snapshot(spark, table, 0)
    assert v0.columns == ["k"]


def test_schema_evolution_under_partitioning(spark, tmp_path):
    """Evolution composes with partition columns: the declared data
    schema (minus partition cols) drives every group scan."""
    table = str(tmp_path / "evolve_part")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "old.parquet"))
    pq.write_table(pa.Table.from_pylist([{"k": 2, "v": 9}]),
                   os.path.join(table, "new.parquet"))
    _commit(table, 0, [
        {"metaData": {"id": "ep", "partitionColumns": ["region"],
                      "schemaString": _schema_str([("k", "long"),
                                                   ("region", "string")])}},
        _add_part("old.parquet", {"region": "emea"}),
    ])
    _commit(table, 1, [
        {"metaData": {"id": "ep", "partitionColumns": ["region"],
                      "schemaString": _schema_str([("k", "long"),
                                                   ("v", "long"),
                                                   ("region", "string")])}},
        _add_part("new.parquet", {"region": "apac"}),
    ])
    df = read_delta_snapshot(spark, table)
    got = {(r["k"], r["v"], r["region"]) for r in df.collect()}
    assert got == {(1, None, "emea"), (2, 9, "apac")}


# ---------------------------------------------------------------------------
# stats-pruning soundness property — skipping may lose work, never rows
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from xml_to_parquet_spark.sources.delta_log import _stats_file_survives

_OPS = ["=", "<", "<=", ">", ">="]


def _matches(op, x, lit):
    return {"=": x == lit, "<": x < lit, "<=": x <= lit,
            ">": x > lit, ">=": x >= lit}[op]


@settings(max_examples=300, deadline=None)
@given(
    lo=st.integers(-50, 50), span=st.integers(0, 30),
    op=st.sampled_from(_OPS), lit=st.integers(-60, 60),
    probe=st.integers(0, 30),
)
def test_stats_pruning_is_sound(lo, span, op, lit, probe):
    """For every file [lo, hi] and predicate (k, op, lit): if ANY value
    inside the file's recorded bounds matches the predicate, the file
    must survive pruning. (The converse — pruning every non-matching
    file — is an optimization goal, not a soundness requirement.)"""
    hi = lo + span
    stats = json.dumps({"minValues": {"k": lo}, "maxValues": {"k": hi}})
    survives = _stats_file_survives(stats, [("k", op, lit)])
    x = lo + (probe % (span + 1))  # an arbitrary value the file may hold
    if _matches(op, x, lit):
        assert survives, (lo, hi, op, lit, x)


@settings(max_examples=100, deadline=None)
@given(op=st.sampled_from(_OPS), lit=st.integers(-60, 60))
def test_stats_pruning_keeps_on_malformed(op, lit):
    """Missing, empty, truncated-to-garbage, or non-numeric stats must
    always keep the file."""
    for s in (None, "", "not json", json.dumps({}),
              json.dumps({"minValues": {"k": "txt"}, "maxValues": {"k": True}})):
        assert _stats_file_survives(s, [("k", op, lit)])


# ---------------------------------------------------------------------------
# lake_delta_snapshot — the registered driver-proof query over this
# adapter (VERDICT r12 #5): independent pandas recompute + scan-set pins
# ---------------------------------------------------------------------------


def _delta_op_fixture(spark, sf_dir):
    from xml_to_parquet_spark.operators.sources_io import (
        _ensure_delta_fixture,
    )

    root = _ensure_delta_fixture(spark, sf_dir)
    assert root is not None
    return root


def test_lake_delta_snapshot_matches_pandas_recompute(spark, sf_dir):
    """Third formulation: plain pandas over the source table and the
    fixture's key-split definition — no Spark, no DuckDB, no log."""
    from xml_to_parquet_spark.operators.sources_io import SNAP_SPLIT
    from xml_to_parquet_spark.registry import lookup

    _delta_op_fixture(spark, sf_dir)
    got = {
        (r["snap"], r["o_orderstatus"]): (
            r["n_orders"], r["price_cents"], r["min_key"], r["max_key"]
        )
        for r in lookup("lake_delta_snapshot").fn(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )

    def expect(sub):
        out = {}
        for s, g in sub.groupby("o_orderstatus"):
            cents = int(
                (g["o_totalprice"] * 100).round().astype("int64").sum()
            )
            out[s] = (len(g), cents, int(g["o_orderkey"].min()),
                      int(g["o_orderkey"].max()))
        return out

    below_f = orders[(orders["o_orderstatus"] == "F")
                     & (orders["o_orderkey"] < SNAP_SPLIT)]
    all_f = orders[orders["o_orderstatus"] == "F"]
    tail = orders[orders["o_orderkey"] >= SNAP_SPLIT]
    want = {}
    for label, sub in [("v0_F", below_f), ("v2_F", all_f),
                       ("v2_tail", tail)]:
        for s, tup in expect(sub).items():
            want[(label, s)] = tup
    assert got == want


def test_lake_delta_snapshot_scan_sets(spark, sf_dir):
    """The three reads plan over exactly the file sets the protocol
    dictates: v0+partition F → only c0_F files; v2+partition F → c1_F
    plus the compacted c2_F file and NONE of the removed c0_F originals;
    v2+stats tail filter → only appended (c1_*) files — the zone map
    provably excludes every below-split file."""
    root = _delta_op_fixture(spark, sf_dir)
    from xml_to_parquet_spark.operators.sources_io import SNAP_SPLIT

    def scanned(df):
        return {
            os.path.relpath(f.removeprefix("file:"), root).split(os.sep)[0]
            for f in df.inputFiles()
        }

    v0_f = read_delta_snapshot(spark, root, version=0,
                               partition_filter={"o_orderstatus": "F"})
    assert scanned(v0_f) == {"c0_F"}
    v2_f = read_delta_snapshot(spark, root, version=2,
                               partition_filter={"o_orderstatus": "F"})
    assert scanned(v2_f) == {"c1_F", "c2_F"}
    v2_tail = read_delta_snapshot(
        spark, root, version=2,
        stats_filter=[("o_orderkey", ">=", SNAP_SPLIT)],
    )
    assert all(d.startswith("c1_") for d in scanned(v2_tail))


def test_lake_delta_snapshot_partition_column_is_log_borne(spark, sf_dir):
    """The data files genuinely lack o_orderstatus (Delta's storage
    contract) — the returned column exists only because the reader
    attaches the log's partitionValues."""
    root = _delta_op_fixture(spark, sf_dir)
    import glob

    some_file = sorted(glob.glob(os.path.join(root, "c0_*", "*.parquet")))[0]
    assert "o_orderstatus" not in pq.read_schema(some_file).names
    df = read_delta_snapshot(spark, root, version=0)
    assert "o_orderstatus" in df.columns
    assert dict(df.dtypes)["o_orderstatus"] == "string"


# ---------------------------------------------------------------------------
# column mapping, 'name' mode — data files / partitionValues / stats all
# speak stable PHYSICAL names; callers keep speaking logical names
# ---------------------------------------------------------------------------

_CM_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-aaa111",
                      "delta.columnMapping.id": 1}},
        {"name": "region", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-bbb222",
                      "delta.columnMapping.id": 2}},
    ],
})


def _cm_meta(mode="name", schema=_CM_SCHEMA):
    return {"metaData": {"id": "cm-fixture",
                         "format": {"provider": "parquet"},
                         "schemaString": schema,
                         "partitionColumns": ["region"],
                         "configuration": {
                             "delta.columnMapping.mode": mode,
                             "delta.columnMapping.maxColumnId": "2",
                         }}}


def _cm_add(path, region_phys_value, lo, hi, n):
    """add action in physical-name vocabulary: partitionValues and stats
    keyed by col-bbb222 / col-aaa111, exactly as a mapping-mode writer
    commits them."""
    return {"add": {
        "path": path,
        "partitionValues": {"col-bbb222": region_phys_value},
        "size": 1, "modificationTime": 0, "dataChange": True,
        "stats": json.dumps({"numRecords": n,
                             "minValues": {"col-aaa111": lo},
                             "maxValues": {"col-aaa111": hi}}),
    }}


@pytest.fixture()
def cm_table(tmp_path):
    """Mapping-mode table: the parquet files contain a column literally
    named col-aaa111 — the logical name 'k' exists only in the schema."""
    table = str(tmp_path / "cm")
    os.makedirs(table, exist_ok=True)
    for name, ks in [("a.parquet", [1, 2]), ("b.parquet", [10, 11]),
                     ("c.parquet", [20, 21])]:
        pq.write_table(
            pa.Table.from_pylist([{"col-aaa111": k} for k in ks]),
            os.path.join(table, name),
        )
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _cm_meta(),
        _cm_add("a.parquet", "emea", 1, 2, 2),
        _cm_add("b.parquet", "emea", 10, 11, 2),
        _cm_add("c.parquet", "apac", 20, 21, 2),
    ])
    return table


def test_column_mapping_reads_logical_names(spark, cm_table):
    df = read_delta_snapshot(spark, cm_table)
    assert set(df.columns) == {"k", "region"}
    got = {(r["k"], r["region"]) for r in df.collect()}
    assert got == {(1, "emea"), (2, "emea"), (10, "emea"), (11, "emea"),
                   (20, "apac"), (21, "apac")}


def test_column_mapping_partition_filter_speaks_logical(spark, cm_table):
    df = read_delta_snapshot(spark, cm_table,
                             partition_filter={"region": "apac"})
    assert {r["k"] for r in df.collect()} == {20, 21}
    assert {os.path.basename(f) for f in df.inputFiles()} == {"c.parquet"}


def test_column_mapping_stats_filter_speaks_logical(spark, cm_table):
    """stats_filter on logical 'k' must translate to the physical stats
    key — and actually skip the provably excluded files."""
    df = read_delta_snapshot(spark, cm_table,
                             stats_filter=[("k", ">=", 10)])
    assert {os.path.basename(f) for f in df.inputFiles()} == {
        "b.parquet", "c.parquet",
    }
    assert {r["k"] for r in df.filter("k >= 10").collect()} == {10, 11, 20, 21}


def test_column_mapping_pushdown_survives_the_rename(spark, cm_table):
    """The logical->physical alias is a projection Catalyst folds into
    the scan: a filter on the LOGICAL name must reach PushedFilters."""
    df = read_delta_snapshot(spark, cm_table).filter("k >= 10").select("k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # hyphenated physical names come back backtick-quoted in the plan
    assert ("PushedFilters: [IsNotNull(`col-aaa111`), "
            "GreaterThanOrEqual(`col-aaa111`,10)") in plan


def test_column_mapping_id_mode_resolves_by_field_id(spark, tmp_path):
    """id-mode data files resolve by PARQUET FIELD ID: this fixture
    file's column is named something the log has never heard of, which
    any name-based read would surface as null — the field id (1, per
    delta.columnMapping.id) must win and deliver the real values, while
    partitionValues/stats keep translating through physicalName."""
    table = str(tmp_path / "cmid")
    os.makedirs(table, exist_ok=True)
    schema = pa.schema([
        pa.field("drifted-name", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
    ])
    pq.write_table(pa.table({"drifted-name": [1, 2]}, schema=schema),
                   os.path.join(table, "a.parquet"))
    pq.write_table(pa.table({"drifted-name": [10, 11]}, schema=schema),
                   os.path.join(table, "b.parquet"))
    _commit(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _cm_meta(mode="id"),
        _cm_add("a.parquet", "emea", 1, 2, 2),
        _cm_add("b.parquet", "apac", 10, 11, 2),
    ])
    df = read_delta_snapshot(spark, table)
    assert set(df.columns) == {"k", "region"}
    got = {(r["k"], r["region"]) for r in df.collect()}
    assert got == {(1, "emea"), (2, "emea"), (10, "apac"), (11, "apac")}
    # logical-vocabulary pruning still works in id mode
    pruned = read_delta_snapshot(spark, table, stats_filter=[("k", ">=", 10)])
    assert {os.path.basename(f) for f in pruned.inputFiles()} == {"b.parquet"}
    only = read_delta_snapshot(spark, table,
                               partition_filter={"region": "apac"})
    assert {r["k"] for r in only.collect()} == {10, 11}


def test_column_mapping_id_mode_without_ids_refused(spark, tmp_path):
    no_ids = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-aaa111"}},
            {"name": "region", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-bbb222"}},
        ],
    })
    table = str(tmp_path / "cmidless")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"col-aaa111": 1}]),
                   os.path.join(table, "a.parquet"))
    _commit(table, 0, [_cm_meta(mode="id", schema=no_ids),
                       _cm_add("a.parquet", "emea", 1, 1, 1)])
    with pytest.raises(ValueError, match="delta.columnMapping.id"):
        read_delta_snapshot(spark, table)


def test_column_mapping_unknown_mode_refused(spark, tmp_path):
    table = str(tmp_path / "cmweird")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"col-aaa111": 1}]),
                   os.path.join(table, "a.parquet"))
    _commit(table, 0, [_cm_meta(mode="someday"),
                       _cm_add("a.parquet", "emea", 1, 1, 1)])
    with pytest.raises(ValueError, match="someday"):
        read_delta_snapshot(spark, table)


def test_column_mapping_nested_physical_name_refused(spark, tmp_path):
    nested = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "s", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-top"},
             "type": {"type": "struct", "fields": [
                 {"name": "inner", "type": "long", "nullable": True,
                  "metadata": {
                      "delta.columnMapping.physicalName": "col-inner"}},
             ]}},
        ],
    })
    table = str(tmp_path / "cmnested")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"col-top": {"col-inner": 1}}]),
                   os.path.join(table, "a.parquet"))
    _commit(table, 0, [
        _cm_meta(schema=nested),
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="NESTED"):
        read_delta_snapshot(spark, table)


def test_column_mapping_missing_physical_name_refused(spark, tmp_path):
    bare = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    table = str(tmp_path / "cmbare")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "a.parquet"))
    _commit(table, 0, [
        _cm_meta(schema=bare),
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="physicalName"):
        read_delta_snapshot(spark, table)


# ---------------------------------------------------------------------------
# V2 checkpoints — top-level <v>.checkpoint.<uniqueId>.{json,parquet} with
# file actions in _delta_log/_sidecars/ (the v2Checkpoint reader feature)
# ---------------------------------------------------------------------------

_V2_PROTOCOL = {"minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"]}

_V2_META = {"id": "v2-fixture", "format": {"provider": "parquet"},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [{"name": "k", "type": "long",
                            "nullable": True, "metadata": {}}]}),
            "partitionColumns": []}


def _write_v2_checkpoint(table, version, active_adds, fmt="parquet",
                         n_sidecars=2, unique="aaaa-bbbb"):
    """V2 checkpoint per PROTOCOL.md: `active_adds` are raw add dicts,
    PARTITIONED across `n_sidecars` sidecar parquet files; the top-level
    file carries checkpointMetadata/protocol/metaData + sidecar refs."""
    log = os.path.join(table, "_delta_log")
    sidedir = os.path.join(log, "_sidecars")
    os.makedirs(sidedir, exist_ok=True)
    chunks = [c for c in
              (active_adds[i::n_sidecars] for i in range(n_sidecars)) if c]
    names = []
    for i, chunk in enumerate(chunks):
        name = f"v{version}-part{i}.parquet"
        pq.write_table(
            pa.Table.from_pylist([{"add": a} for a in chunk]),
            os.path.join(sidedir, name),
        )
        names.append(name)
    if fmt == "json":
        top = os.path.join(log, f"{version:020d}.checkpoint.{unique}.json")
        with open(top, "w") as fh:
            fh.write(json.dumps(
                {"checkpointMetadata": {"version": version}}) + "\n")
            fh.write(json.dumps({"protocol": _V2_PROTOCOL}) + "\n")
            fh.write(json.dumps({"metaData": _V2_META}) + "\n")
            for n in names:
                fh.write(json.dumps({"sidecar": {
                    "path": n, "sizeInBytes": 1,
                    "modificationTime": 0}}) + "\n")
    else:
        top = os.path.join(log, f"{version:020d}.checkpoint.{unique}.parquet")
        rows = [
            {"checkpointMetadata": {"version": version}, "protocol": None,
             "metaData": None, "sidecar": None},
            {"checkpointMetadata": None, "protocol": _V2_PROTOCOL,
             "metaData": None, "sidecar": None},
            {"checkpointMetadata": None, "protocol": None,
             "metaData": _V2_META, "sidecar": None},
        ] + [
            {"checkpointMetadata": None, "protocol": None, "metaData": None,
             "sidecar": {"path": n, "sizeInBytes": 1, "modificationTime": 0}}
            for n in names
        ]
        pq.write_table(pa.Table.from_pylist(rows), top)
    return top


def _plain_add(path):
    return {"path": path, "size": 1, "dataChange": True}


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_v2_checkpoint_seeds_log_cleaned_table(spark, tmp_path, fmt):
    """With commits 0-1 cleaned, the v2 top-level + sidecars are the
    ONLY seed — versions 2 and 3 must read exactly like the pure-JSON
    twin, and the metaData carried by the top-level file supplies the
    explicit read schema."""
    table = _build_four_commit_table(tmp_path / fmt)
    _write_v2_checkpoint(
        table, 2,
        [_plain_add(p) for p in ("f1.parquet", "f2.parquet", "f3.parquet")],
        fmt=fmt,
    )
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    assert list_delta_versions(table) == [2, 3]
    assert _basenames(delta_active_files(table, 2)) == {
        "f1.parquet", "f2.parquet", "f3.parquet",
    }
    got = {r["k"] for r in read_delta_snapshot(spark, table, 3).collect()}
    assert got == {4, 5, 6, 7}


def test_v2_checkpoint_feature_in_protocol_reads(tmp_path):
    """A table declaring the v2Checkpoint reader feature is no longer
    refused — the feature is implemented."""
    table = str(tmp_path)
    pq.write_table(pa.Table.from_pylist([{"k": 1}]),
                   os.path.join(table, "f.parquet"))
    _commit(table, 0, [
        {"protocol": _V2_PROTOCOL},
        {"metaData": _V2_META},
        _add("f.parquet"),
    ])
    assert _basenames(delta_active_files(table)) == {"f.parquet"}


def test_classic_seed_preferred_over_v2(spark, tmp_path):
    """When a version has BOTH a classic checkpoint and a v2 one, the
    classic seeds. Proven behaviorally: the v2 checkpoint here is TORN
    (its sidecar deleted) — the read must still succeed through the
    classic file."""
    table = _build_four_commit_table(tmp_path / "both")
    _write_checkpoint(table, 2, ["f1.parquet", "f2.parquet", "f3.parquet"],
                      tombstones=["f0.parquet"])
    _write_v2_checkpoint(
        table, 2,
        [_plain_add(p) for p in ("f1.parquet", "f2.parquet", "f3.parquet")],
        n_sidecars=1,
    )
    os.remove(os.path.join(table, "_delta_log", "_sidecars",
                           "v2-part0.parquet"))
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    assert _basenames(delta_active_files(table, 2)) == {
        "f1.parquet", "f2.parquet", "f3.parquet",
    }


def test_v2_missing_sidecar_fails_loudly(tmp_path):
    """A v2 checkpoint whose sidecar is gone must error, never serve the
    partial state as a snapshot."""
    table = _build_four_commit_table(tmp_path / "torn")
    _write_v2_checkpoint(
        table, 2,
        [_plain_add(p) for p in ("f1.parquet", "f2.parquet", "f3.parquet")],
        n_sidecars=1,
    )
    os.remove(os.path.join(table, "_delta_log", "_sidecars",
                           "v2-part0.parquet"))
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    with pytest.raises(FileNotFoundError):
        delta_active_files(table, 2)


def test_v2_sidecar_deletion_vector_applies(spark, tmp_path):
    """An add row inside a SIDECAR carrying a deletionVector is as
    binding as one in a JSON commit."""
    from tests.test_delta_dv import _serialize_treemap, _z85_encode

    table = str(tmp_path)
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.Table.from_pylist([{"k": k} for k in range(4)]),
                   os.path.join(table, "f.parquet"))
    blob = _serialize_treemap([1])
    dv = {"storageType": "i", "pathOrInlineDv": _z85_encode(blob),
          "sizeInBytes": len(blob), "cardinality": 1}
    _write_v2_checkpoint(table, 0, [dict(_plain_add("f.parquet"),
                                         deletionVector=dv)],
                         n_sidecars=1)
    got = {r["k"] for r in read_delta_snapshot(spark, table, 0).collect()}
    assert got == {0, 2, 3}


# ---------------------------------------------------------------------------
# delta_version_as_of (r14): timestamp-based time travel, ICT-first
# ---------------------------------------------------------------------------


def _dated_table(tmp_path, stamps, kind="timestamp"):
    """Minimal 3-commit log whose commitInfo carries the given instants
    (kind: 'timestamp' | 'ict' | 'none' for mtime fallback)."""
    table = str(tmp_path / "asof")
    meta = {"metaData": {"id": "asof-fixture",
                         "format": {"provider": "parquet"},
                         "schemaString": json.dumps(
                             {"type": "struct", "fields": []}),
                         "partitionColumns": [], "configuration": {}}}
    for v, ts in enumerate(stamps):
        actions = []
        if kind == "timestamp":
            actions.append({"commitInfo": {"timestamp": ts}})
        elif kind == "ict":
            actions.append({"commitInfo": {"inCommitTimestamp": ts,
                                           "timestamp": ts + 999_999}})
        if v == 0:
            actions.append(meta)
        actions.append(_add(f"f{v}.parquet"))
        _commit(table, v, actions)
    return table


def test_version_as_of_resolves_commit_timestamps(tmp_path):
    from xml_to_parquet_spark.sources.delta_log import delta_version_as_of

    table = _dated_table(tmp_path, [1000, 2000, 3000])
    assert delta_version_as_of(table, 1000) == 0
    assert delta_version_as_of(table, 1999) == 0
    assert delta_version_as_of(table, 2500) == 1
    assert delta_version_as_of(table, 3000) == 2
    with pytest.raises(ValueError, match="at or before"):
        delta_version_as_of(table, 999)
    # future instants raise per Delta's reference timestampAsOf
    # (ADVICE r14; the full contract is pinned in test_advice_r15.py)
    with pytest.raises(ValueError, match="after the latest"):
        delta_version_as_of(table, 999_999)


def test_version_as_of_prefers_in_commit_timestamp(tmp_path):
    """ICT is authoritative when present — the wall-clock field beside
    it is deliberately skewed a million ms and must be ignored."""
    from xml_to_parquet_spark.sources.delta_log import delta_version_as_of

    table = _dated_table(tmp_path, [1000, 2000, 3000], kind="ict")
    assert delta_version_as_of(table, 2999) == 1


def test_version_as_of_adjusts_non_monotonic_clocks(tmp_path):
    """Writer clock skew: commit 1 stamped BEFORE commit 0. Adjusted
    upward (ts[1] = ts[0] + 1) so the mapping stays well-defined:
    nothing can resolve to a version the instant ordering contradicts."""
    from xml_to_parquet_spark.sources.delta_log import delta_version_as_of

    table = _dated_table(tmp_path, [5000, 1000, 9000])
    assert delta_version_as_of(table, 5000) == 0
    assert delta_version_as_of(table, 5001) == 1  # adjusted instant
    assert delta_version_as_of(table, 8999) == 1
    assert delta_version_as_of(table, 9000) == 2


def test_version_as_of_mtime_fallback(tmp_path):
    """Commits without commitInfo (the classic pre-ICT log) fall back to
    file modification times, pinned here explicitly with os.utime."""
    from xml_to_parquet_spark.sources.delta_log import delta_version_as_of

    table = _dated_table(tmp_path, [0, 0, 0], kind="none")
    log = os.path.join(table, "_delta_log")
    for v, sec in enumerate([10, 20, 30]):
        os.utime(os.path.join(log, f"{v:020d}.json"), (sec, sec))
    assert delta_version_as_of(table, 10_000) == 0
    assert delta_version_as_of(table, 25_000) == 1
    assert delta_version_as_of(table, 30_000) == 2
