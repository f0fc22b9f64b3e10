"""Physical-plan inspection helpers — the feedback loop for keeping every
operator's plan the one we'd want at 100 TB (tests assert on these, so a
regression that turns a broadcast join into a cartesian product or drops a
pushed filter fails CI, not the cluster).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


_NODE_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|"
    r"CartesianProduct|Exchange hashpartitioning|Exchange rangepartitioning|"
    r"Exchange SinglePartition|TakeOrderedAndProject|HashAggregate|"
    r"ObjectHashAggregate|SortAggregate|Window|WholeStageCodegen)"
)


def node_counts(df: DataFrame) -> dict[str, int]:
    return dict(Counter(_NODE_RE.findall(physical_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    n = node_counts(df)
    return sum(v for k, v in n.items() if k.startswith("Exchange"))


def broadcast_join_count(df: DataFrame) -> int:
    n = node_counts(df)
    return n.get("BroadcastHashJoin", 0) + n.get("BroadcastNestedLoopJoin", 0)


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line[len("ReadSchema:"):].strip())
    return out
