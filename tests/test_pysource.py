"""Custom Python DataSource connector (sources/pysource.py).

Pins the three connector obligations: deterministic generation that
matches the documented md5 formula, partition planning (N slices ->
N scan partitions), and planning-time filter pushdown (range
predicates on the partition key prune whole slices — while staying
semantically optional because Spark re-applies every filter).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lakehouse_tools_spark.sources.pysource import (
    TYPES,
    read_synthetic_events,
)


def _expected_row(i: int):
    h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    return (i, 1 + h % 1000, TYPES[h % 5], (h % 100_000) / 100.0)


def test_rows_match_documented_formula(spark):
    df = read_synthetic_events(spark, rows=64, partitions=4)
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(_expected_row(i) for i in range(64))
    assert got == want


def test_partition_planning(spark):
    df = read_synthetic_events(spark, rows=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    # re-read is bit-identical (no RNG state anywhere)
    again = read_synthetic_events(spark, rows=1000, partitions=8)
    assert df.exceptAll(again).count() == 0


def test_filter_pushdown_prunes_partitions(spark):
    df = read_synthetic_events(spark, rows=1000, partitions=8)
    narrow = df.filter(F.col("event_id") < 125)  # exactly slice 0
    # planning-time pruning: the v2 scan plans only the surviving
    # slice(s); allow one boundary slice of slack so the test pins
    # pruning happened without overfitting the grid arithmetic
    assert narrow.rdd.getNumPartitions() <= 2
    assert narrow.count() == 125
    # pruning is not load-bearing: values equal an unpruned filter
    full = {tuple(r) for r in df.collect() if r.event_id < 125}
    assert {tuple(r) for r in narrow.collect()} == full


def test_pushdown_bounds_compose(spark):
    df = read_synthetic_events(spark, rows=1000, partitions=8)
    mid = df.filter(
        (F.col("event_id") >= 500) & (F.col("event_id") <= 624)
    )
    assert mid.count() == 125
    assert mid.rdd.getNumPartitions() <= 2
    lo = mid.agg(F.min("event_id"), F.max("event_id")).first()
    assert (lo[0], lo[1]) == (500, 624)
