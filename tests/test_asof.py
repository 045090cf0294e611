"""As-of join semantics (operators.asof)."""

from __future__ import annotations

import datetime as dt

from lakehouse_tools_spark.operators.asof import asof_join


def ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts(5)), (1, ts(10)), (2, ts(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(0), 100.0), (1, ts(5), 200.0), (1, ts(7), 300.0), (2, ts(6), 400.0)],
        "k long, rts timestamp, v double",
    )
    out = {
        (r.k, r.ts.minute, r.v)
        for r in asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect()
    }
    assert out == {
        (1, 5, 200.0),  # update effective AT event time is visible
        (1, 10, 300.0),  # latest prior
        (2, 5, None),  # no prior right row -> null
    }


def test_asof_keeps_all_left_rows(spark, tables):
    ev = tables["events"]
    from pyspark.sql import functions as F

    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["v"])
    assert out.count() == left.count()


def test_asof_single_shuffle(spark, tables):
    ev = tables["events"]
    from pyspark.sql import functions as F

    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", "ts", F.col("value").alias("v"))
    plan = asof_join(left, right, ["user_id"], "ts", "ts", ["v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # union + one window shuffle, no join
    assert "Join" not in plan


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, ts(5)), (1, ts(10)), (2, ts(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(0), 100.0), (1, ts(5), 200.0), (1, ts(7), 300.0), (2, ts(3), 400.0)],
        "k long, rts timestamp, v double",
    )
    out = {
        (r.k, r.ts.minute, r.v)
        for r in asof_join(
            left, right, ["k"], "ts", "rts", ["v"], direction="forward"
        ).collect()
    }
    assert out == {
        (1, 5, 200.0),   # simultaneous row matches in forward mode too
        (1, 10, None),   # nothing at-or-after
        (2, 5, None),    # only an earlier right row exists
    }


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([(1, ts(30))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(0), 100.0)], "k long, rts timestamp, v double"
    )
    loose = asof_join(
        left, right, ["k"], "ts", "rts", ["v"], tolerance_seconds=3600
    ).collect()[0]
    tight = asof_join(
        left, right, ["k"], "ts", "rts", ["v"], tolerance_seconds=60
    ).collect()[0]
    assert loose.v == 100.0 and tight.v is None


def test_asof_rejects_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, ts(0))], "k long, ts timestamp")
    with pytest.raises(ValueError):
        asof_join(left, left, ["k"], "ts", "ts", direction="sideways")


def test_asof_nearest(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=t(10)),  # right at 7 (gap 3) vs 12 (gap 2) -> forward
            Row(lid=2, k="a", ts=t(8)),   # 7 (gap 1) vs 12 (gap 4) -> backward
            Row(lid=3, k="a", ts=t(30)),  # only backward candidate (12)
            Row(lid=4, k="a", ts=t(1)),   # only forward candidate (7)
            Row(lid=5, k="b", ts=t(5)),   # no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=t(7), v=70.0), Row(k="a", ts=t(12), v=120.0)]
    )
    out = {r.lid: r.v for r in asof_join(
        left, right, ["k"], "ts", "ts", ["v"], direction="nearest"
    ).collect()}
    assert out[1] == 120.0 and out[2] == 70.0
    assert out[3] == 120.0 and out[4] == 70.0 and out[5] is None


def test_asof_nearest_tie_prefers_backward(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([Row(lid=1, k="a", ts=t(10))])
    right = spark.createDataFrame(
        [Row(k="a", ts=t(8), v=1.0), Row(k="a", ts=t(12), v=2.0)]
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], direction="nearest"
    ).collect()
    assert out[0].v == 1.0  # equal 2s gaps -> backward wins


def test_asof_nearest_with_tolerance(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([Row(lid=1, k="a", ts=t(30))])
    right = spark.createDataFrame([Row(k="a", ts=t(7), v=70.0)])
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        direction="nearest", tolerance_seconds=5,
    ).collect()
    assert out[0].v is None  # 23s gap > 5s tolerance
