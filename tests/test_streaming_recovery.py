"""Streaming checkpoint/recovery: the exactly-once contract.

A file-source streaming aggregation runs with a real checkpointLocation,
is stopped, more data arrives, and the SAME query (same checkpoint)
resumes: the source must pick up only the new files, and the final counts
must equal batch truth over everything — no reprocessing, no loss.

r16 extends the family from source-offset recovery to STATE recovery
(R17_PLAN depth item 2, pulled forward): applyInPandasWithState running
state, event-time timers, and stream-stream join buffers must all
survive a stop/restart against the same checkpoint — silent state loss
drops output with no error, so each has an explicit pin. Recoverable
runs drain through foreachBatch (the memory sink only supports
checkpoint recovery in complete mode).

Late-r16 extends it again to the CRASH path (R17_PLAN candidate #2
pulled forward): a sink failure mid-batch must redeliver the SAME epoch
with the same batch_id and identical rows (the idempotent-sink
contract), and a crashed batch must NOT leak its state-store updates —
the redelivered batch applies against the pre-crash state, so counts
stay exactly-once.
"""

import shutil

from pyspark.sql import functions as F


def _run_counts(spark, src_dir, ckpt, name):
    schema = "user_id long, value double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["user_id"]: r["n"] for r in spark.table(name).collect()}


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    batch1 = spark.createDataFrame(
        [(u, float(v)) for u in range(5) for v in range(10)], "user_id long, value double"
    )
    batch1.write.mode("append").parquet(str(src))
    first = _run_counts(spark, str(src), ckpt, "rec_a")
    assert first == {u: 10 for u in range(5)}

    # new data arrives while the query is down
    batch2 = spark.createDataFrame(
        [(u, float(v)) for u in range(3) for v in range(7)], "user_id long, value double"
    )
    batch2.write.mode("append").parquet(str(src))

    resumed = _run_counts(spark, str(src), ckpt, "rec_b")
    assert resumed == {0: 17, 1: 17, 2: 17, 3: 10, 4: 10}

    # a FRESH checkpoint reprocesses everything — proving the resumed run
    # above really did incremental work from checkpointed source offsets
    shutil.rmtree(ckpt)
    fresh = _run_counts(spark, str(src), ckpt + "2", "rec_c")
    assert fresh == resumed


def _run_stateful(spark, src_dir, ckpt, fn, out_schema, state_schema,
                  timeout_conf, watermark=None):
    """Run one availableNow pass of an applyInPandasWithState query over a
    file source under the production RocksDB state-store scope (the same
    scope _drain uses), draining through a recoverable foreachBatch sink;
    return the emitted rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    from xml_to_parquet_spark.streaming.windows import _state_partitions

    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
    rows = []
    with _state_partitions(spark):
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return rows


def _make_running_count_fn():
    # nested so cloudpickle serializes it BY VALUE — executors' Python
    # workers cannot import the tests module by name
    def _running_count_fn(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    return _running_count_fn


def test_stateful_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state (RocksDB provider, changelog
    checkpointing) must RESUME from the checkpoint: a per-user running
    count seeded in run 1 continues — not restarts — when the same query
    resumes over new files. This is the contract a 24/7 stateful job
    relies on across every deploy/failure; nothing else in the suite
    exercised state-store RECOVERY (only source-offset recovery)."""
    import datetime

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    fn = _make_running_count_fn()

    rows1 = [(u, t0, float(u)) for u in range(4) for _ in range(5)]
    spark.createDataFrame(rows1, "user_id long, ts timestamp, value double") \
        .write.mode("append").parquet(str(src))
    first = _run_stateful(
        spark, str(src), ckpt, fn,
        "user_id bigint, n bigint", "n bigint", GroupStateTimeout.NoTimeout,
    )
    assert {r["user_id"]: r["n"] for r in first} == {u: 5 for u in range(4)}

    # down; users 0-1 send 3 more events each
    rows2 = [(u, t0, float(u)) for u in range(2) for _ in range(3)]
    spark.createDataFrame(rows2, "user_id long, ts timestamp, value double") \
        .write.mode("append").parquet(str(src))
    resumed = _run_stateful(
        spark, str(src), ckpt, fn,
        "user_id bigint, n bigint", "n bigint", GroupStateTimeout.NoTimeout,
    )
    got = {r["user_id"]: r["n"] for r in resumed}
    # counts CONTINUE from checkpointed state (5+3), and only the users in
    # the new batch re-emit (update mode) — both would fail if state reset
    assert got == {0: 8, 1: 8}


def test_event_time_timer_fires_after_restart(spark, tmp_path):
    """An EventTimeTimeout timer ARMED in run 1 must fire in run 2 after
    the restart advances the watermark past it — pinning that timers and
    their state live in the checkpoint, not the query object. Uses the
    engine's own _timeout_state_fn (stream_timer_timeout's callback), so
    the inactivity-emission op is what's being recovery-tested."""
    import datetime

    from pyspark.sql.streaming.state import GroupStateTimeout

    from xml_to_parquet_spark.streaming.stateful import (
        TIMER_DELAY,
        _timeout_state_fn,
    )

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    out_schema = "user_id bigint, n_events bigint, last_ts_us bigint"
    state_schema = "n bigint, last_us bigint"

    # run 1: user 7 events at t0; timer armed at t0+2h. Watermark after
    # run 1 = t0 - 30min (delay) → nothing fires.
    rows1 = [(7, t0, 1.0), (7, t0, 2.0)]
    spark.createDataFrame(rows1, "user_id long, ts timestamp, value double") \
        .write.mode("append").parquet(str(src))
    first = _run_stateful(
        spark, str(src), ckpt, _timeout_state_fn,
        out_schema, state_schema, GroupStateTimeout.EventTimeTimeout,
        watermark=TIMER_DELAY,
    )
    assert first == []  # data batches only arm the timer

    # down; a DIFFERENT user's event 6h later arrives. On resume the
    # watermark advances to t0+6h-30min > t0+2h → user 7's timer fires
    # with the CHECKPOINTED state (n=2, last_ts=t0).
    t1 = t0 + datetime.timedelta(hours=6)
    spark.createDataFrame(
        [(8, t1, 3.0)], "user_id long, ts timestamp, value double"
    ).write.mode("append").parquet(str(src))
    resumed = _run_stateful(
        spark, str(src), ckpt, _timeout_state_fn,
        out_schema, state_schema, GroupStateTimeout.EventTimeTimeout,
        watermark=TIMER_DELAY,
    )
    fired = {r["user_id"]: (r["n_events"], r["last_ts_us"]) for r in resumed}
    t0_us = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert fired[7] == (2, t0_us)


def test_stream_stream_join_state_survives_restart(spark, tmp_path):
    """Stream-stream inner join: LEFT rows buffered in run 1 must still
    match RIGHT rows that arrive only AFTER a restart — the buffered side
    lives in the join's state store and is restored from the checkpoint.
    Loss of that state silently drops matches (no error), which is why it
    needs an explicit recovery pin."""
    import datetime

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.streaming.windows import _state_partitions

    clicks_dir = tmp_path / "clicks"
    imps_dir = tmp_path / "imps"
    ckpt = str(tmp_path / "ckpt")
    clicks_dir.mkdir()
    imps_dir.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def run():
        clicks = (
            spark.readStream.schema("ad_id long, click_ts timestamp")
            .parquet(str(clicks_dir))
            .withWatermark("click_ts", "10 minutes")
        )
        imps = (
            spark.readStream.schema("ad_id long, imp_ts timestamp")
            .parquet(str(imps_dir))
            .withWatermark("imp_ts", "10 minutes")
        )
        joined = clicks.join(
            imps,
            (clicks["ad_id"] == imps["ad_id"])
            & (clicks["click_ts"] >= imps["imp_ts"])
            & (clicks["click_ts"] <= imps["imp_ts"] + F.expr("INTERVAL 1 HOUR")),
            "inner",
        ).select(clicks["ad_id"], "click_ts", "imp_ts")
        rows = []
        with _state_partitions(spark):
            q = (
                joined.writeStream.outputMode("append")
                .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return rows

    # run 1: clicks only — nothing to match yet, rows go into join state
    clicks1 = [(1, t0 + datetime.timedelta(minutes=5)),
               (2, t0 + datetime.timedelta(minutes=6))]
    spark.createDataFrame(clicks1, "ad_id long, click_ts timestamp") \
        .write.mode("append").parquet(str(clicks_dir))
    assert run() == []

    # down; the matching impressions arrive (earlier event time, in-range)
    imps1 = [(1, t0), (2, t0), (99, t0)]
    spark.createDataFrame(imps1, "ad_id long, imp_ts timestamp") \
        .write.mode("append").parquet(str(imps_dir))
    matched = run()
    assert sorted(r["ad_id"] for r in matched) == [1, 2]


def test_streaming_scope_uses_rocksdb_state_store(spark):
    """r7 contract (VERDICT r6 #7): every drained streaming query runs on
    the RocksDB state-store provider with changelog checkpointing (the
    100 TB backend — off-heap state, incremental checkpoints), and the
    scoped conf is restored afterwards."""
    from xml_to_parquet_spark.streaming.windows import (
        ROCKSDB_PROVIDER,
        _state_partitions,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    with _state_partitions(spark):
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        assert (
            spark.conf.get(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"
            )
            == "true"
        )
    assert spark.conf.get(key) != ROCKSDB_PROVIDER


def test_crash_mid_batch_redelivers_same_batch_exactly_once(spark, tmp_path):
    """CRASH path (vs the clean-stop tests above): a foreachBatch sink
    that throws MID-BATCH fails the query; on restart from the same
    checkpoint the engine must REDELIVER the same epoch with the same
    batch_id and identical rows — the contract that makes idempotent
    (batch_id-keyed) sinks exactly-once. No loss, no duplicates."""
    import pytest as _pt
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.createDataFrame(
        [(u, float(u)) for u in range(20)], "user_id long, value double"
    ).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("user_id long, value double").parquet(str(src))

    attempt1 = []

    def crashing(bdf, bid):
        attempt1.append((bid, sorted(r["user_id"] for r in bdf.collect())))
        raise RuntimeError("injected mid-batch crash")

    q = (
        stream.writeStream.foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with _pt.raises(StreamingQueryException, match="injected mid-batch crash"):
        q.awaitTermination()

    attempt2 = []
    stream2 = spark.readStream.schema("user_id long, value double").parquet(str(src))
    q2 = (
        stream2.writeStream.foreachBatch(
            lambda bdf, bid: attempt2.append(
                (bid, sorted(r["user_id"] for r in bdf.collect()))
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    # same epoch, same batch id, identical rows — and delivered once
    assert len(attempt1) == 1 and len(attempt2) == 1
    assert attempt2[0] == attempt1[0]


def test_state_not_committed_by_a_crashed_batch(spark, tmp_path):
    """Stateful exactly-once through a CRASH: a batch that fails in the
    sink must NOT leave its state-store updates behind — on restart the
    redelivered batch applies against the PRE-crash state, so a running
    count reads 8, never 11. Double-counting here is the classic
    at-least-once bug an idempotent sink cannot repair (state is
    engine-internal)."""
    import pytest as _pt
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql.streaming.state import GroupStateTimeout

    from xml_to_parquet_spark.streaming.windows import _state_partitions

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    fn = _make_running_count_fn()
    schema = "user_id long, ts timestamp, value double"

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, 0.0)] * 5, schema
    ).write.mode("append").parquet(str(src))

    def run(sink):
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = stream.groupBy("user_id").applyInPandasWithState(
            fn,
            outputStructType="user_id bigint, n bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        with _state_partitions(spark):
            q = (
                out.writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    ok1 = []
    run(lambda bdf, bid: ok1.extend(bdf.collect()))
    assert {r["user_id"]: r["n"] for r in ok1} == {1: 5}

    # 3 more events; the batch that processes them CRASHES in the sink
    spark.createDataFrame([(1, t0, 0.0)] * 3, schema) \
        .write.mode("append").parquet(str(src))

    def crashing(bdf, bid):
        bdf.collect()  # force the stateful computation to actually run
        raise RuntimeError("injected crash after compute")

    with _pt.raises(StreamingQueryException, match="injected crash"):
        run(crashing)

    # restart: the redelivered batch applies against n=5, lands on n=8 —
    # a crashed batch that leaked its state update would read 11
    ok2 = []
    run(lambda bdf, bid: ok2.extend(bdf.collect()))
    assert {r["user_id"]: r["n"] for r in ok2} == {1: 8}
