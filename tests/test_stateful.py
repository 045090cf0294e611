"""applyInPandasWithState sessionization on a real stream."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_tools_spark.streaming.stateful import stateful_sessionize
from lakehouse_tools_spark.streaming.windows import sessionize, with_watermark

EVENTS_DDL = "event_id long, ts timestamp, user_id long, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stateful_sessionize_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user=1, value=1.0):
        return (i, t0 + dt.timedelta(minutes=minute), user, value)

    # user1: session A (0,2,4), gap >= 5 -> session B (10); user2: one session
    _write_batch(spark, src, [ev(1, 0), ev(2, 2), ev(3, 4), ev(4, 10), ev(5, 0, user=2)])
    # batch 2 advances the watermark far past 10:00+gap so B flushes too
    _write_batch(spark, src, [ev(6, 120), ev(7, 120, user=2)])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_sessionize(with_watermark(stream, "ts", "0 seconds"), gap_minutes=5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stateful_sessions")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.sql("select * from t_stateful_sessions").collect()
    }
    assert (1, "2024-01-01 00:00:00", 3, 3.0) in rows  # closed by in-key gap
    assert (1, "2024-01-01 00:10:00", 1, 1.0) in rows  # flushed by watermark timeout
    assert (2, "2024-01-01 00:00:00", 1, 1.0) in rows


def test_stateful_late_event_does_not_split_session(spark, tmp_path):
    # A late-but-within-watermark event landing INSIDE the open session
    # interval must merge via min/max — it must not drag the session end
    # backwards (which would make the next on-time event split the
    # session). An event strictly BEFORE the interval becomes its own
    # closed session.
    src = str(tmp_path / "late_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user=1, value=1.0):
        return (i, t0 + dt.timedelta(minutes=minute), user, value)

    # user1: batch1 = 0,4 -> open [0..4]; batch2 = 2 (late, inside) and
    # 8 (on-time, within gap of 4) -> ONE session 0..8 n=4.
    # user2: batch1 = 50; batch2 = 21 (late, strictly before) -> the
    # straggler is emitted as its own closed singleton.
    _write_batch(spark, src, [ev(1, 0), ev(2, 4), ev(3, 50, user=2)])
    _write_batch(spark, src, [ev(4, 2), ev(5, 8), ev(6, 21, user=2)])
    # batch3 closes user1's 0..8 (gap) and user2's 50 (gap)
    _write_batch(spark, src, [ev(7, 120), ev(8, 120, user=2)])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_sessionize(
        with_watermark(stream, "ts", "30 minutes"), gap_minutes=5
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stateful_late")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.sql("select * from t_stateful_late").collect()
    }
    assert (1, "2024-01-01 00:00:00", 4, 4.0) in rows  # merged, not split
    # the buggy end-moves-backwards behavior would have produced these:
    assert (1, "2024-01-01 00:00:00", 3, 3.0) not in rows
    assert (1, "2024-01-01 00:08:00", 1, 1.0) not in rows
    assert (2, "2024-01-01 00:21:00", 1, 1.0) in rows  # straggler singleton
    assert (2, "2024-01-01 00:50:00", 1, 1.0) in rows


def test_stateful_agrees_with_native_session_window(spark, tables):
    # Batch cross-check: the explicit-state operator must produce the
    # same sessions as F.session_window on identical inputs. Run the
    # stateful one through a one-shot stream over the fixture events.
    ev = tables["events"].limit(0)  # schema only; we use a parquet stream below
    native = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(tables["events"], "5 minutes").collect()
    }
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/events"
        tables["events"].select("event_id", "ts", "user_id", "value").write.parquet(src)
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        out = stateful_sessionize(
            with_watermark(stream, "ts", "0 seconds"), gap_minutes=5
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_stateful_xcheck")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        got = {
            (r.user_id, r.session_start, r.n_events)
            for r in spark.sql("select * from t_stateful_xcheck").collect()
        }
    # single batch -> watermark never advances within it, so open
    # (= last-per-user) sessions stay in state; everything emitted must
    # be a subset and all gap-closed sessions must be present.
    assert got <= native
    n_users = tables["events"].select("user_id").distinct().count()
    assert len(got) >= len(native) - n_users


def test_stragglers_merge_with_each_other(spark, tmp_path):
    # Two late-but-within-watermark events that are ≥ gap before the
    # open session but within gap of EACH OTHER must come out as ONE
    # merged session (native session_window semantics), not as two
    # singletons — the round-3 divergence, now closed by keeping the
    # full unsealed-interval set in state.
    src = str(tmp_path / "straggler_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user=1, value=1.0):
        return (i, t0 + dt.timedelta(minutes=minute), user, value)

    _write_batch(spark, src, [ev(1, 50)])
    _write_batch(spark, src, [ev(2, 20), ev(3, 22), ev(4, 23)])
    _write_batch(spark, src, [ev(5, 120)])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_sessionize(
        with_watermark(stream, "ts", "40 minutes"), gap_minutes=5
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_stateful_straggler")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.sql("select * from t_stateful_straggler").collect()
    }
    assert (1, "2024-01-01 00:20:00", 3, 3.0) in rows  # merged stragglers
    assert (1, "2024-01-01 00:50:00", 1, 1.0) in rows
    # the old divergence would have produced singletons:
    assert (1, "2024-01-01 00:20:00", 1, 1.0) not in rows
    assert (1, "2024-01-01 00:22:00", 1, 1.0) not in rows
