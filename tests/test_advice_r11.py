"""Round-11 ADVICE closures (ADVICE.md, r10 advisor):

1. sources_io's compaction/clustering manifest reads must not swallow
   genuine IO/schema failures behind a blanket ``except Exception`` —
   only the expected empty layout (partitionBy of an empty DataFrame
   commits just _SUCCESS) may degrade to a None/empty manifest; a
   corrupt data file must raise, not grade as an empty plan.
2. dedup.ER_NODE_OFFSET's disjointness claim is a runtime-enforced
   precondition now, not a docstring promise: a clean key at or above
   the offset raises instead of silently merging unrelated entities.
3. Streaming fixture roots (stream_cdc_apply, stream_foreach_batch)
   route through the shared io_paths scratch location, which is
   configurable via XTPS_SCRATCH_ROOT — no side-channel /tmp roots.
"""

from __future__ import annotations

import os

import pytest

from xml_to_parquet_spark.io_paths import has_data_files, scratch_dir
from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# 1. manifest reads: empty layout degrades, corruption propagates
# ---------------------------------------------------------------------------


def test_has_data_files_distinguishes_markers_from_data(tmp_path):
    d = tmp_path / "layout"
    assert not has_data_files(str(d))  # missing dir
    d.mkdir()
    assert not has_data_files(str(d))  # empty dir
    (d / "_SUCCESS").touch()
    assert not has_data_files(str(d))  # committed but empty (marker only)
    (d / ".crc").touch()
    assert not has_data_files(str(d))  # hidden files don't count
    (d / "file_id=0").mkdir()
    assert has_data_files(str(d))  # partition subdir counts


def test_fragmented_manifest_none_on_empty_layout(spark, tmp_path, monkeypatch):
    """An empty orders table commits a _SUCCESS-only layout; the manifest
    helper must report None (no files) WITHOUT an exception handler in
    the read path."""
    from xml_to_parquet_spark.operators import sources_io

    sf = tmp_path / "sf_empty"
    sf.mkdir()
    empty = spark.createDataFrame(
        [], "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string"
    )
    empty.write.mode("overwrite").parquet(str(sf / "orders.parquet"))
    assert sources_io._fragmented_manifest(spark, str(sf)) is None


def test_fragmented_manifest_raises_on_corrupt_layout(spark, sf_dir):
    """A genuine IO failure — a committed layout whose data file is not
    parquet — must PROPAGATE (the r10 blanket except graded this as an
    empty compaction plan)."""
    from xml_to_parquet_spark.operators import sources_io

    data = scratch_dir(sf_dir, "compact_orders_corrupt")
    os.makedirs(data, exist_ok=True)
    open(os.path.join(data, "_SUCCESS"), "w").close()
    with open(os.path.join(data, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    orig = sources_io.scratch_dir
    try:
        sources_io.scratch_dir = (
            lambda s, name: data if name == "compact_orders" else orig(s, name)
        )
        with pytest.raises(Exception):
            df = sources_io._fragmented_manifest(spark, sf_dir)
            if df is not None:  # force evaluation if lazily returned
                df.collect()
    finally:
        sources_io.scratch_dir = orig


# ---------------------------------------------------------------------------
# 2. ER node-range disjointness is enforced, not assumed
# ---------------------------------------------------------------------------


def test_er_offset_guard_raises_on_collision():
    from xml_to_parquet_spark.operators.dedup import (
        ER_NODE_OFFSET,
        _assert_er_node_ranges_disjoint,
    )

    _assert_er_node_ranges_disjoint(None)  # empty roster: fine
    _assert_er_node_ranges_disjoint(ER_NODE_OFFSET - 1)  # at the bound: fine
    with pytest.raises(ValueError, match="ranges collide"):
        _assert_er_node_ranges_disjoint(ER_NODE_OFFSET)
    with pytest.raises(ValueError, match="ranges collide"):
        _assert_er_node_ranges_disjoint(ER_NODE_OFFSET + 12345)


def test_er_cluster_entities_still_green_under_guard(spark, sf_dir):
    """The guard must be a no-op on the graded rosters (max custkey far
    below the offset)."""
    from xml_to_parquet_spark.registry import lookup

    rows = lookup("er_cluster_entities").fn(spark, sf_dir).collect()
    assert len(rows) > 0


# ---------------------------------------------------------------------------
# 3. fixture IO shares one configurable scratch root
# ---------------------------------------------------------------------------


def test_scratch_root_is_configurable(monkeypatch, tmp_path):
    monkeypatch.setenv("XTPS_SCRATCH_ROOT", str(tmp_path / "alt_root"))
    p = scratch_dir("/root/testdata/sf0.001", "somefixture")
    assert p.startswith(str(tmp_path / "alt_root"))
    assert p.endswith("/sf0.001/somefixture")


def test_no_side_channel_tmp_roots_in_streaming():
    """No streaming module builds its own /tmp path (the io_paths scratch
    root is the single configurable location; ADVICE r10 #3)."""
    import pathlib

    pkg = pathlib.Path("xml_to_parquet_spark")
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name == "io_paths.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if '"/tmp/' in line or "'/tmp/" in line:
                offenders.append(f"{py}:{i}: {line.strip()}")
    assert not offenders, offenders
