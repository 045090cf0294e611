"""Custom Python DataSource connector (sources/pysource.py).

Pins the three connector obligations: deterministic generation that
matches the documented md5 formula, partition planning (N slices ->
N scan partitions), and planning-time filter pushdown (range
predicates on the partition key prune whole slices — while staying
semantically optional because Spark re-applies every filter).

Pushdown is OPT-IN since r08: Spark 4.1 stores the last filtered
scan's Python planning result on the shared relation, so a reused
DataFrame re-scanned under a weaker filter can lose rows (measured:
df.filter(id<125) then df.count() -> 125; a union of two filtered
branches of one load undercounts). The default never prunes — plan
reuse stays correct — and pruning tests give each filtered scan its
own fresh load, per the documented single-use contract.
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
    narrow = read_synthetic_events(
        spark, rows=1000, partitions=8, pushdown=True
    ).filter(F.col("event_id") < 125)  # exactly slice 0
    # planning-time pruning: the v2 scan plans only the surviving
    # slice(s); allow one boundary slice of slack so the test pins
    # pruning happened without overfitting the grid arithmetic
    assert narrow.rdd.getNumPartitions() <= 2
    assert narrow.count() == 125
    # pruning is not load-bearing: values equal an unpruned filter
    # over a SEPARATE un-pushed load (single-use contract)
    df = read_synthetic_events(spark, rows=1000, partitions=8)
    full = {tuple(r) for r in df.collect() if r.event_id < 125}
    assert {tuple(r) for r in narrow.collect()} == full


def test_pushdown_bounds_compose(spark):
    mid = read_synthetic_events(
        spark, rows=1000, partitions=8, pushdown=True
    ).filter((F.col("event_id") >= 500) & (F.col("event_id") <= 624))
    assert mid.count() == 125
    assert mid.rdd.getNumPartitions() <= 2
    lo = mid.agg(F.min("event_id"), F.max("event_id")).first()
    assert (lo[0], lo[1]) == (500, 624)


def test_default_never_prunes_so_plan_reuse_is_correct(spark):
    # the r08 hazard regression: with pushdown OFF (default), one
    # loaded relation scanned under several filter contexts — the
    # exact pattern that lost rows under always-on pushdown — stays
    # correct everywhere
    df = read_synthetic_events(spark, rows=1000, partitions=8)
    n1 = df.filter(F.col("event_id") < 125)
    n2 = df.filter(F.col("event_id") >= 500)
    assert n1.count() == 125
    assert n2.count() == 500
    assert df.count() == 1000  # the scan that read 500 before r08
    assert n1.union(n2).count() == 625  # the scan that read 500 before
    assert df.rdd.getNumPartitions() == 8
