"""bench.py contract test: the driver records bench output per round by
parsing ONE JSON line from stdout — a broken bench is a silently missed
grade, so the contract is pinned here.

Runs the real bench as a subprocess at the smallest scale factor with one
rep (fastest honest configuration)."""

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        # The bench list has grown to 86 entries (83 queries + 3
        # conversions), each run twice (warmup + timed) plus session
        # recycling; 480s was sized for the ~50-entry era and a fast
        # container. A measured sf0.001/reps=1 run on a slow container
        # reads ~229s timed + warmup — budget 3× headroom.
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "headline_queries_total_runtime"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) >= {
        "q1_pricing_summary",
        "dedup_minhash_lsh",
        "convert_200_xml_files",
    }
    assert all(v >= 0 for v in payload["queries"].values())


def test_warmup_reports_named_failures(spark):
    """The fail-loud contract (VERDICT r4 #3): a query that raises during
    warmup must come back as a NAMED failure so main() can exit nonzero
    before any timing runs — not be swallowed into a timed-loop crash."""
    import bench
    from xml_to_parquet_spark.registry import QueryDef, load_all

    registry = dict(load_all())

    def _boom(spark, sf_dir):
        raise RuntimeError("synthetic analysis failure")

    registry["__broken__"] = QueryDef(_boom, None)
    failures = bench.warmup(
        spark, registry, ["q1_pricing_summary", "__broken__"]
    )
    assert list(failures) == ["__broken__"]
    assert "synthetic analysis failure" in failures["__broken__"]
