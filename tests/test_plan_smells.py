"""Registry-WIDE physical-plan smell gate (complements the per-op pins
in tests/test_plans.py, which cover only the queries someone thought to
pin): every registered AND staged query's returned plan is swept for
the two patterns that are never right at 100 TB —

  * ``CartesianProduct``: an unbounded all-pairs join. Bounded
    broadcast-NLJ devices (grid joins, threshold broadcasts) are fine
    and NOT flagged — Spark only falls back to CartesianProduct when
    neither side is broadcastable, which at scale means a shuffle of
    |A|x|B| rows.
  * ``BatchEvalPython`` (row-at-a-time Python UDF): every Python
    crossing in this engine is Arrow-batched (``ArrowEvalPython`` /
    ``mapInPandas`` / ``BatchEvalPythonUDTF``); a plain ``F.udf`` that
    sneaks in costs ~10-100x on the hot path and fails here instead of
    on a cluster.

Limitation, stated honestly: iterative operators that localCheckpoint
internally surface only their POST-checkpoint plan — their inner-round
plans are covered by the per-op pins, not this sweep. The sweep is one
test (not a 300-way parametrize) so a full run costs one pass over the
registry at the smallest SF; it asserts an empty violation list and
prints every offender on failure.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark.registry import STAGED, load_all

SF_DIR = os.environ.get("XTPS_SMELL_SF", "/root/testdata/sf0.001")

# BatchEvalPythonUDTF is the UDTF exec node (its lateral-join shape is
# pinned in test_plans.py) — only the plain row-at-a-time scalar-UDF
# node `BatchEvalPython [...]` is a smell, so the match must not catch
# the UDTF node's prefix.
_UDF_SMELL_RE = re.compile(r"\bBatchEvalPython\b(?!UDTF)")
_UDF_SMELL = "BatchEvalPython"

_SMELL_ALLOWLIST: dict[str, set[str]] = {
    # name -> smells allowed, each with a reason reviewed at add time.
    # Empty today: no registered or staged op needs a CartesianProduct
    # or a row-at-a-time Python UDF. Additions require a docstring in
    # the op justifying the bound.
}


def test_no_plan_smells_across_entire_registry(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    queries = dict(load_all())
    queries.update({name: qd for name, qd in STAGED.items()})
    violations: list[str] = []
    for name, qd in sorted(queries.items()):
        try:
            df = qd.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            violations.append(f"{name}: plan build failed: {e!r:.200}")
            continue
        allowed = _SMELL_ALLOWLIST.get(name, set())
        if "CartesianProduct" in plan and "CartesianProduct" not in allowed:
            violations.append(f"{name}: CartesianProduct in plan")
        if _UDF_SMELL_RE.search(plan) and _UDF_SMELL not in allowed:
            violations.append(f"{name}: row-at-a-time Python UDF in plan")
    assert not violations, "\n".join(violations)
