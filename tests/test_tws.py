"""transformWithStateInPandas sessionization (Spark 4 state API).

The TWS operator must be a drop-in twin of the applyInPandasWithState
one: same sessions, same emission timing, including the straggler
merge semantics. All streaming tests run under the scoped RocksDB
provider (transformWithState keeps each state variable in its own
column family, which the default HDFS provider rejects).
"""

from __future__ import annotations

import datetime as dt

import pytest

from lakehouse_tools_spark.streaming.stateful import stateful_sessionize
from lakehouse_tools_spark.streaming.tws import (
    rocksdb_state_store,
    stateful_sessionize_tws,
    tws_runtime_ready,
)
from lakehouse_tools_spark.streaming.windows import sessionize, with_watermark

EVENTS_DDL = "event_id long, ts timestamp, user_id long, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, out, name):
    with rocksdb_state_store(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
    return {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.sql(f"select * from {name}").collect()
    }


def _require_tws(spark):
    if not tws_runtime_ready(spark):
        pytest.skip("transformWithState runtime (google.protobuf) unavailable")


def test_tws_runtime_is_ready_here(spark):
    # get_session ran ensure_tws_runtime before the JVM launched, and
    # this sandbox carries the Cloud SDK's vendored protobuf — so the
    # probe must say YES here; environments without any protobuf
    # source fall back (q_events_stream_sessionize_tws documents it)
    assert tws_runtime_ready(spark)


def test_tws_sessionize_stream(spark, tmp_path):
    _require_tws(spark)
    src = str(tmp_path / "tws_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user=1, value=1.0):
        return (i, t0 + dt.timedelta(minutes=minute), user, value)

    # user1: session A (0,2,4), gap >= 5 -> session B (10); user2: one
    _write_batch(spark, src, [ev(1, 0), ev(2, 2), ev(3, 4), ev(4, 10), ev(5, 0, user=2)])
    # batch 2 advances the watermark far past 10:00+gap so B flushes
    _write_batch(spark, src, [ev(6, 120), ev(7, 120, user=2)])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_sessionize_tws(
        with_watermark(stream, "ts", "0 seconds"), gap_minutes=5
    )
    rows = _drain(spark, out, "t_tws_sessions")
    assert (1, "2024-01-01 00:00:00", 3, 3.0) in rows  # closed by gap
    assert (1, "2024-01-01 00:10:00", 1, 1.0) in rows  # flushed by timer
    assert (2, "2024-01-01 00:00:00", 1, 1.0) in rows


def test_tws_stragglers_merge_with_each_other(spark, tmp_path):
    # the round-3 divergence case: two late-but-within-watermark events
    # >= gap before the open session but within gap of each other must
    # come out as ONE merged session — the interval-SET state must
    # survive the API port
    _require_tws(spark)
    src = str(tmp_path / "tws_straggler_src")
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
    out = stateful_sessionize_tws(
        with_watermark(stream, "ts", "40 minutes"), gap_minutes=5
    )
    rows = _drain(spark, out, "t_tws_straggler")
    assert (1, "2024-01-01 00:20:00", 3, 3.0) in rows  # merged stragglers
    assert (1, "2024-01-01 00:50:00", 1, 1.0) in rows
    assert (1, "2024-01-01 00:20:00", 1, 1.0) not in rows
    assert (1, "2024-01-01 00:22:00", 1, 1.0) not in rows


def test_tws_agrees_with_legacy_and_native(spark, tables, tmp_path):
    # fixture-scale three-way agreement: TWS == applyInPandasWithState
    # == batch session_window (both streaming ops drained over the same
    # multi-batch stream; full equality because a 2030 sentinel-free
    # comparison here uses identical drains, so open-session holdback
    # cancels out; native is the >= gap-closed reference)
    _require_tws(spark)
    src = str(tmp_path / "tws_xcheck")
    ev = tables["events"].select("event_id", "ts", "user_id", "value")
    ev.write.parquet(src)

    def run(op, name):
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        out = op(with_watermark(stream, "ts", "0 seconds"), gap_minutes=5)
        return _drain(spark, out, name)

    got_tws = run(stateful_sessionize_tws, "t_tws_xcheck_new")
    got_legacy = run(stateful_sessionize, "t_tws_xcheck_legacy")
    assert got_tws == got_legacy
    native = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(tables["events"], "5 minutes").collect()
    }
    emitted = {(u, s, n) for (u, s, n, _v) in got_tws}
    assert emitted <= native
    n_users = tables["events"].select("user_id").distinct().count()
    assert len(emitted) >= len(native) - n_users


def test_tws_timer_flush_seals_idle_sessions(spark, tmp_path):
    # Timer-flush semantics after the r09 removal of the min-armed
    # strategy (ADVICE r08: a stale-PRESENT worker-local cache could
    # suppress registerTimer after partition migration, leaving an
    # idle session never timer-sealed). Per-batch re-arm has no
    # worker-local state to go stale: session B below (user 1's
    # minute-30 event, user 2's minute-31) receives NO further input
    # and is only ever sealed by a timer fire as the watermark
    # advances — including through the stale-fire idempotent re-arm
    # chain (earlier timers from prior batches are left outstanding
    # by design).
    _require_tws(spark)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user=1, value=1.0):
        return (i, t0 + dt.timedelta(minutes=minute), user, value)

    batches = [
        [ev(1, 0), ev(2, 2), ev(3, 4), ev(4, 10), ev(5, 0, user=2)],
        [ev(6, 30), ev(7, 31, user=2)],
        [ev(8, 120), ev(9, 120, user=2)],
    ]
    src = str(tmp_path / "tws_timer_flush")
    for b in batches:
        _write_batch(spark, src, b)
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_sessionize_tws(
        with_watermark(stream, "ts", "0 seconds"), gap_minutes=5
    )
    got = _drain(spark, out, "t_tws_timer_flush")
    # the single-event session at minute 10 seals via its timer
    assert (1, "2024-01-01 00:10:00", 1, 1.0) in got
    # the idle minute-30/31 sessions seal once the watermark (driven
    # only by the minute-120 batch) passes their gap — timer-only
    assert (1, "2024-01-01 00:30:00", 1, 1.0) in got
    assert (2, "2024-01-01 00:31:00", 1, 1.0) in got


def test_tws_constant_factor_vs_legacy_is_pinned(spark, tables, tmp_path):
    # the TWS runtime costs a measured ~1.5x constant factor over the
    # legacy state API at bench scale (SCALING.md r07/r08 A/B, parallel
    # scaling curves; attributed to state-server serialization +
    # RocksDB maintenance) — pin an upper bound so a regression to 3x+
    # (e.g. a per-row state round-trip creeping in) is caught at
    # fixture scale
    import time

    _require_tws(spark)
    src = str(tmp_path / "tws_ratio_src")
    ev = tables["events"].select("event_id", "ts", "user_id", "value")
    ev.write.parquet(src)

    def timed(op, name):
        t0 = time.time()
        stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
        out = op(with_watermark(stream, "ts", "0 seconds"), gap_minutes=5)
        _drain(spark, out, name)
        return time.time() - t0

    # untimed warm-up of both runtimes (JIT, RocksDB provider load)
    timed(stateful_sessionize_tws, "t_ratio_warm_tws")
    timed(stateful_sessionize, "t_ratio_warm_legacy")
    t_tws = min(timed(stateful_sessionize_tws, f"t_ratio_tws_{i}") for i in (1, 2))
    t_leg = min(timed(stateful_sessionize, f"t_ratio_leg_{i}") for i in (1, 2))
    assert t_tws / t_leg < 3.0, (t_tws, t_leg)
