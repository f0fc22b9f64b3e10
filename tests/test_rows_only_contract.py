"""Declared rows-only verification contract (VERDICT r16 #5).

approx_count_distinct (and every other sketch-backed entry) can never
hash-match a DuckDB oracle — the estimate is approximate BY CONTRACT.
Its declared check is therefore ``rows_only``: deterministic row count
+ schema. These tests pin (a) the declaration surface, (b) that the
flagged entry really is deterministic in row count AND values across
repeated runs on the same input (HLL is deterministic for a fixed
input/plan — "approximate" ≠ "random"), so the driver's rows-only
comparison is a meaningful gate, not a rubber stamp.
"""

from __future__ import annotations

from xml_to_parquet_spark.registry import load_all


def test_rows_only_entries_are_declared():
    reg = load_all()
    assert reg["approx_count_distinct"].check == "rows_only"
    assert reg["approx_count_distinct"].oracle is None
    # oracle-backed entries declare the full check
    assert reg["q1_pricing_summary"].check == "oracle"
    # every rows-only declaration corresponds to a missing oracle and
    # vice versa — the two surfaces cannot drift apart
    for name, qd in reg.items():
        assert (qd.oracle is None) == (qd.check == "rows_only"), name


def test_approx_count_distinct_rows_only_is_deterministic(spark, sf_dir):
    reg = load_all()
    fn = reg["approx_count_distinct"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0
