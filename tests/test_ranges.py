"""interval_bin_join == naive cross-join-filter, on synthetic data
with bucket-boundary and multi-bucket-spanning intervals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.ranges import interval_bin_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _fixture(spark):
    points = spark.createDataFrame(
        [Row(pid=i, ts=_ts(s), k=i % 2) for i, s in enumerate(
            [0, 1, 599, 600, 601, 3600, 7199, 7200, 10000]
        )]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=1, s=_ts(0), e=_ts(600), k=0),       # boundary-closed
            Row(iid=2, s=_ts(500), e=_ts(7200), k=1),    # spans many buckets
            Row(iid=3, s=_ts(9000), e=_ts(9500), k=0),   # matches nothing
            Row(iid=4, s=_ts(10000), e=_ts(10000), k=1), # zero-length
        ]
    )
    return points, intervals


def test_matches_naive_join(spark):
    points, intervals = _fixture(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bin_join(
            points.drop("k"), intervals.drop("k"), "ts", "s", "e", bucket_seconds=600
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals.drop("k"))
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
        .collect()
    )
    assert got == naive and len(got) > 0
    # closed bounds: ts==600 matches [0,600] and zero-length [10000,10000] matches
    assert (3, 1) in got and (8, 4) in got


def test_bucket_width_invariance(spark):
    points, intervals = _fixture(spark)
    results = [
        sorted(
            (r["pid"], r["iid"])
            for r in interval_bin_join(
                points.drop("k"), intervals.drop("k"), "ts", "s", "e", bucket_seconds=w
            ).collect()
        )
        for w in (60, 600, 3600, 86400)
    ]
    assert all(r == results[0] for r in results)


def test_left_join_preserves_unmatched_points(spark):
    points, intervals = _fixture(spark)
    left = interval_bin_join(
        points.drop("k"), intervals.drop("k"), "ts", "s", "e",
        bucket_seconds=600, how="left",
    )
    rows = left.collect()
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals.drop("k"))
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))
        .collect()
    }
    matched = {(r["pid"], r["iid"]) for r in rows if r["iid"] is not None}
    assert matched == naive
    # every point appears; points inside no interval exactly once, null-extended
    unmatched_pids = {r["pid"] for r in points.collect()} - {p for p, _ in naive}
    null_rows = [(r["pid"], r["iid"]) for r in rows if r["iid"] is None]
    assert sorted(p for p, _ in null_rows) == sorted(unmatched_pids)
    assert len(rows) == len(naive) + len(unmatched_pids)


def test_right_and_full_rejected(spark):
    import pytest

    points, intervals = _fixture(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            interval_bin_join(
                points.drop("k"), intervals.drop("k"), "ts", "s", "e", how=how
            )


def test_extra_keys(spark):
    points, intervals = _fixture(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bin_join(
            points, intervals, "ts", "s", "e", bucket_seconds=600, extra_keys=("k",)
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.withColumnRenamed("k", "pk")
        .crossJoin(intervals)
        .where(
            (F.col("ts") >= F.col("s"))
            & (F.col("ts") <= F.col("e"))
            & (F.col("pk") == F.col("k"))
        )
        .collect()
    )
    assert got == naive and len(got) > 0


def test_interval_overlap_join_exactly_once(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.ranges import interval_overlap_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    left = spark.createDataFrame(
        [
            Row(lid=1, ls=t(0), le=t(30)),    # overlaps r1, r2
            Row(lid=2, ls=t(50), le=t(55)),   # overlaps nothing
            Row(lid=3, ls=t(100), le=t(400)), # long: spans many buckets, overlaps r3
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=1, rs=t(10), re=t(20)),
            Row(rid=2, rs=t(25), re=t(45)),
            Row(rid=3, rs=t(390), re=t(600)),
        ]
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_seconds=600
    )
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    # each overlapping pair appears exactly once despite multi-bucket
    # intervals (owner-bucket rule)
    assert pairs == [(1, 1), (1, 2), (3, 3)]


def test_interval_overlap_join_touching_bounds(spark):
    import datetime as dt

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.ranges import interval_overlap_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    left = spark.createDataFrame([Row(lid=1, ls=t(0), le=t(10))])
    right = spark.createDataFrame([Row(rid=1, rs=t(10), re=t(20))])
    # closed bounds: touching endpoints overlap
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_seconds=60
    )
    assert out.count() == 1
