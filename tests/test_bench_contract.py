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
        timeout=480,
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
