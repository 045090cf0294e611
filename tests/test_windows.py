"""Event-time windows: tumbling, sliding, session (batch + streaming)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from lakehouse_tools_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)


def ev(minute, second=0, user=1, etype="click", value=1.0):
    return Row(
        event_id=minute * 100 + second,
        ts=dt.datetime(2024, 1, 1, 0, minute, second),
        user_id=user,
        event_type=etype,
        value=value,
    )


def test_tumbling_counts(spark):
    df = spark.createDataFrame([ev(0), ev(1), ev(4, 59), ev(5), ev(9, 59)])
    out = {(r.window_start, r.n_events) for r in tumbling_counts(df, "5 minutes").collect()}
    assert out == {("2024-01-01 00:00:00", 3), ("2024-01-01 00:05:00", 2)}


def test_sliding_each_event_in_two_windows(spark):
    df = spark.createDataFrame([ev(7)])
    out = sorted(r.window_start for r in sliding_counts(df, "10 minutes", "5 minutes").collect())
    assert out == ["2024-01-01 00:00:00", "2024-01-01 00:05:00"]


def test_session_gap_semantics(spark):
    # gaps < 5 min merge; a gap of exactly >= 5 min starts a new session
    df = spark.createDataFrame([ev(0), ev(4), ev(8), ev(20), ev(21)])
    out = sorted(
        (r.session_start, r.n_events) for r in sessionize(df, "5 minutes").collect()
    )
    assert out == [("2024-01-01 00:00:00", 3), ("2024-01-01 00:20:00", 2)]


def test_streaming_tumbling_runs(spark, tmp_path):
    # The same builder must plan on a readStream relation: rate source
    # -> watermark -> tumbling counts -> memory sink.
    from lakehouse_tools_spark.streaming.windows import with_watermark
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 2).cast("string").alias("event_type"),
            (F.col("value") % 10).cast("double").alias("value"),
        )
    )
    agg = tumbling_counts(with_watermark(stream, "ts", "1 seconds"), "1 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_tumbling")
        .start()
    )
    try:
        # Wait for the FIRST completed micro-batch, bounded. NOT
        # processAllAvailable(): a rate source produces rows forever,
        # so "all available" only terminates when a whole poll cycle
        # beats the 1 s production interval — on a contended host a
        # ~1.2 s batch chases the source indefinitely (observed: 1283
        # micro-batches / 26 min in the r12 opening test run). One
        # committed batch is exactly what this test asserts: the
        # builder planned on a readStream relation and executed.
        import time

        deadline = time.time() + 120
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        assert q.recentProgress, "no micro-batch completed within 120 s"
        rows = spark.sql("select * from t_stream_tumbling").collect()
        assert rows is not None  # query planned and ran; rows may be 0..n
        assert set(agg.columns) == {"window_start", "event_type", "n_events", "sum_value"}
    finally:
        q.stop()


def test_streaming_watermark_matches_batch_cut(spark):
    """The availableNow streaming run must emit exactly the windows
    whose end the final watermark (max ts - delay) passed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from lakehouse_tools_spark.sources.tables import load_stream, load_table
    from lakehouse_tools_spark.streaming.sink import run_to_memory
    from lakehouse_tools_spark.streaming.windows import tumbling_counts, with_watermark

    sf = "/root/testdata/sf0.001"
    stream = load_stream(spark, sf, "events")
    agg = tumbling_counts(with_watermark(stream, "ts", "10 minutes"), "5 minutes")
    got = {tuple(r) for r in run_to_memory(agg, "ev_wm_unit").collect()}

    ev = load_table(spark, sf, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    cut = mx - dt.timedelta(minutes=10)
    want = {
        tuple(r)
        for r in tumbling_counts(ev, "5 minutes")
        .filter(
            F.to_timestamp("window_start") + F.expr("INTERVAL 5 MINUTES")
            <= F.lit(cut)
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_gap_fill_zero_buckets(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.streaming.windows import gap_fill

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        Row(event_id=1, ts=t(0), event_type="a"),
        Row(event_id=2, ts=t(0), event_type="a"),
        Row(event_id=3, ts=t(3), event_type="a"),  # hours 1,2 empty
        Row(event_id=4, ts=t(5), event_type="b"),
    ]
    out = {(r.key, r.window_start): r.n_events for r in gap_fill(
        spark.createDataFrame(rows), "1 hour"
    ).collect()}
    assert out[("a", "2024-01-01 00:00:00")] == 2
    assert out[("a", "2024-01-01 01:00:00")] == 0
    assert out[("a", "2024-01-01 02:00:00")] == 0
    assert out[("a", "2024-01-01 03:00:00")] == 1
    # key b has a single bucket; no spine outside its own span
    assert out[("b", "2024-01-01 05:00:00")] == 1
    assert len(out) == 5


def test_forward_fill_locf(spark):
    from pyspark.sql import Row

    from lakehouse_tools_spark.streaming.windows import forward_fill

    rows = [
        Row(k="a", i=1, v=10.0),
        Row(k="a", i=2, v=None),
        Row(k="a", i=3, v=None),
        Row(k="a", i=4, v=40.0),
        Row(k="b", i=1, v=None),  # leading null stays null
        Row(k="b", i=2, v=5.0),
    ]
    out = {(r.k, r.i): r.v for r in forward_fill(
        spark.createDataFrame(rows), "i", "k", ["v"]
    ).collect()}
    assert out[("a", 2)] == 10.0 and out[("a", 3)] == 10.0
    assert out[("a", 4)] == 40.0
    assert out[("b", 1)] is None and out[("b", 2)] == 5.0


def test_interpolate_linear(spark):
    from pyspark.sql import Row

    from lakehouse_tools_spark.streaming.windows import interpolate_linear

    rows = [
        Row(k="a", i=0, v=10.0),
        Row(k="a", i=1, v=None),
        Row(k="a", i=2, v=None),
        Row(k="a", i=3, v=40.0),
        Row(k="a", i=4, v=None),   # trailing -> stays null
        Row(k="b", i=0, v=None),   # leading -> stays null
        Row(k="b", i=1, v=7.0),
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r.k, r.i): r.v for r in interpolate_linear(df, "i", "k", "v").collect()}
    assert out[("a", 1)] == 20.0 and out[("a", 2)] == 30.0
    assert out[("a", 0)] == 10.0 and out[("a", 3)] == 40.0
    assert out[("a", 4)] is None and out[("b", 0)] is None
    # non-uniform gaps interpolate by POSITION, not by rank
    df2 = spark.createDataFrame(
        [Row(k="c", i=0, v=0.0), Row(k="c", i=10, v=None), Row(k="c", i=20, v=100.0)],
        "k string, i long, v double",
    )
    o2 = {r.i: r.v for r in interpolate_linear(df2, "i", "k", "v").collect()}
    assert o2[10] == 50.0


def test_backward_fill_and_composition(spark):
    from pyspark.sql import Row

    from lakehouse_tools_spark.streaming.windows import (
        backward_fill,
        forward_fill,
    )

    rows = [
        Row(k="a", i=0, v=None),
        Row(k="a", i=1, v=10.0),
        Row(k="a", i=2, v=None),
        Row(k="a", i=3, v=30.0),
        Row(k="a", i=4, v=None),
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    b = {r.i: r.v for r in backward_fill(df, "i", "k", ["v"]).collect()}
    assert b[0] == 10.0 and b[2] == 30.0 and b[4] is None
    # forward then backward leaves no nulls when any observation exists
    dense = backward_fill(forward_fill(df, "i", "k", ["v"]), "i", "k", ["v"])
    vals = {r.i: r.v for r in dense.collect()}
    assert None not in vals.values()
    assert vals[0] == 10.0 and vals[2] == 10.0 and vals[4] == 30.0


def test_ewma_truncated_formula(spark):
    from lakehouse_tools_spark.streaming.windows import ewma

    xs = [4.0, 0.0, 8.0, 2.0, 6.0]
    rows = [Row(k="a", i=i, v=v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        r.i: r.ewma
        for r in ewma(df, "i", "k", "v", alpha=0.5, window=3).collect()
    }
    # replay the truncated formula: weights (1-a)^j over trailing 3 rows
    for t in range(len(xs)):
        lags = [xs[t - j] for j in range(3) if t - j >= 0]
        num = sum(x * 0.5**j for j, x in enumerate(lags))
        den = sum(0.5**j for j in range(len(lags)))
        assert abs(got[t] - num / den) < 1e-12, t


def test_ewma_null_handling_and_validation(spark):
    import pytest as _pytest

    from lakehouse_tools_spark.streaming.windows import ewma

    rows = [
        Row(k="a", i=0, v=None),
        Row(k="a", i=1, v=None),
        Row(k="a", i=2, v=12.0),
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {r.i: r.ewma for r in ewma(df, "i", "k", "v", window=2).collect()}
    # all-null trailing window -> null; null lags drop from both sums
    assert got[0] is None and got[1] is None and got[2] == 12.0
    with _pytest.raises(ValueError):
        ewma(df, "i", "k", "v", alpha=1.0)
    with _pytest.raises(ValueError):
        ewma(df, "i", "k", "v", window=0)


def test_ewma_oracle_terms_match_duckdb(spark):
    import duckdb

    from lakehouse_tools_spark.streaming.windows import (
        ewma,
        ewma_oracle_terms,
    )

    rows = [Row(k="a", i=i, v=float((i * 7) % 5)) for i in range(20)] + [
        Row(k="b", i=i, v=float(i)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    sdf = (
        ewma(df, "i", "k", "v", alpha=0.4, window=8)
        .select("k", "i", "ewma")
        .toPandas()
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    num, den = ewma_oracle_terms("v", "i", "k", 0.4, 8)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    odf = (
        con.sql(
            f"SELECT k, i, ({num}) / ({den}) AS ewma FROM t ORDER BY k, i"
        )
        .df()
        .reset_index(drop=True)
    )
    # bit-identical: same literals, same left-to-right evaluation order
    assert list(sdf["ewma"]) == list(odf["ewma"])
