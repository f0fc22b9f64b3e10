"""Round-10 ADVICE closures (ADVICE.md, r9 advisor):

1. stream_stream_outer's oracle must not evict on one-sided input —
   SQL least() ignores NULL, so a corpus with clicks but zero purchases
   previously made the oracle emit watermark-expired NULL rows while
   Spark's purchase-side watermark never advanced and emitted none.
2. lake_snapshot_read's build-once guard must key on ALL build artifacts:
   data's _SUCCESS lands before man1/v2-append/man2, so a data-only guard
   skips the rebuild after a mid-build failure and dies reading missing
   manifests.
3. lake_manifest_prune must survive a zero-survivor prune (empty table /
   no overlapping file) with a schema-only empty scan, not a
   spark.read.parquet() crash. Empty-table coverage for both lake ops
   (plus the other r10 promotions) lives in test_empty_tables.py.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# 1. stream_stream_outer: one-sided input (clicks, zero purchases)
# ---------------------------------------------------------------------------


def test_stream_outer_one_sided_input_emits_nothing(reg, spark, sf_dir, tmp_path):
    """With zero purchase events the purchase-side watermark never
    advances, so the global (min-over-inputs) watermark never closes any
    click's join window: Spark emits NO rows — no matches AND no
    NULL-flush. The oracle must agree; before the CASE gate it computed
    least(click_max, NULL) = click_max and wrongly evicted every click."""
    one_sided = tmp_path / "one_sided_sf"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "event_type <> 'purchase'"
    )
    assert ev.filter("event_type = 'click'").count() > 0
    ev.write.mode("overwrite").parquet(str(one_sided / "events.parquet"))

    out = reg["stream_stream_outer"].fn(spark, str(one_sided)).collect()
    assert out == [], (
        f"purchase watermark never advanced, yet {len(out)} rows emitted"
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{one_sided}/events.parquet/*.parquet'"
    )
    oracle_rows = con.execute(reg["stream_stream_outer"].oracle).fetchall()
    assert oracle_rows == [], (
        f"oracle evicted {len(oracle_rows)} rows on one-sided input — "
        "least() NULL gate regressed"
    )


# ---------------------------------------------------------------------------
# 2. lake_snapshot_read: per-artifact build guard
# ---------------------------------------------------------------------------


def test_lake_snapshot_guard_rebuilds_after_lost_artifact(spark, sf_dir):
    """Simulate the mid-build failure the advisor described: the data dir
    committed but a manifest is missing. A data-only guard would skip the
    rebuild and crash reading the manifest; the per-artifact guard must
    rebuild and return the exact same snapshots."""
    from xml_to_parquet_spark.io_paths import scratch_dir
    from xml_to_parquet_spark.registry import lookup

    fn = lookup("lake_snapshot_read").fn
    before = sorted(map(tuple, fn(spark, sf_dir).collect()))
    man2 = scratch_dir(sf_dir, "snap_manifest_v2")
    shutil.rmtree(man2)  # data + man1 still committed
    after = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert after == before

    # and the same for a lost man1 (first manifest, mid-build shape)
    man1 = scratch_dir(sf_dir, "snap_manifest_v1")
    shutil.rmtree(man1)
    again = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert again == before


# ---------------------------------------------------------------------------
# 3. lake_manifest_prune: zero-survivor prune
# ---------------------------------------------------------------------------


def test_lake_manifest_prune_zero_survivors(spark, sf_dir, tmp_path,
                                            monkeypatch):
    """Force a predicate window that no data file overlaps (orders keys
    are non-negative, prune on a negative range): the pruned scan must be
    a schema-only empty relation, and the aggregate over it must be
    empty — not a spark.read.parquet() TypeError."""
    from xml_to_parquet_spark.operators import sources_io

    monkeypatch.setattr(sources_io, "PRUNE_LO", -2000)
    monkeypatch.setattr(sources_io, "PRUNE_HI", -1000)
    out = sources_io.lake_manifest_prune(spark, sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "o_orderstatus", "n_orders", "price_cents", "min_key", "max_key",
    ]
