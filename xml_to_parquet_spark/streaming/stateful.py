"""Custom stateful streaming operator [EXT] via applyInPandasWithState —
the escape hatch for operators Spark's built-in windows can't express
(SURVEY.md §2.2 streaming row).

The example keeps a running per-user event counter + max-value across
micro-batches: state lives in the state store keyed by user_id, arriving
batches update it, and the final batch emits one row per user. Semantics
are batch-reproducible (count/max are order-insensitive), so this gets a
DuckDB oracle even though it runs through the streaming state machinery.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.streaming.windows import _drain, _events_stream


def _update_user_state(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, vmax = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, vmax))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [vmax]})


@register(
    "stream_stateful_counter",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(round(max(CAST(value AS DECIMAL(24,8))), 4) AS DOUBLE) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_counter(spark, sf_dir):
    """Arbitrary stateful op: per-user running (count, max) maintained in
    the state store across micro-batches. At scale, state is partitioned by
    the group key across executors and checkpointed — the knobs that matter
    are state-store partition count and state TTL (NoTimeout here because
    the replay is finite)."""
    from pyspark.sql import functions as F

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType="user_id bigint, n_events bigint, max_value double",
        stateStructType="n bigint, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = _drain(out, ["user_id", "n_events", "max_value"], mode="update")
    # update mode emits one row per user per micro-batch; keep the final one
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("max_value").cast("decimal(24,8)"), 4)
            .cast("double")
            .alias("max_value"),
        )
    )
