"""Incremental rollup maintenance (operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.rollup import (
    merge_rollups,
    rollup_partials,
    rollup_result,
)

KEYS = ["o_orderpriority"]
MEASURES = ["o_totalprice"]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_batches_equals_whole_exactly(spark, tables):
    """The maintenance law, as EXACT equality (decimal sums make the
    merge split-invariant — float sums would differ in the last ulp)."""
    orders = tables["orders"]
    parts = [
        rollup_partials(orders.filter(F.col("o_orderkey") % 4 == i), KEYS, MEASURES)
        for i in range(4)
    ]
    merged = merge_rollups(parts, KEYS)
    whole = rollup_partials(orders, KEYS, MEASURES)
    assert _canon(merged) == _canon(whole)


def test_merge_is_order_insensitive(spark, tables):
    orders = tables["orders"]
    parts = [
        rollup_partials(orders.filter(F.col("o_orderkey") % 3 == i), KEYS, MEASURES)
        for i in range(3)
    ]
    a = merge_rollups(parts, KEYS)
    b = merge_rollups(list(reversed(parts)), KEYS)
    assert _canon(a) == _canon(b)


def test_result_avg_is_global_not_average_of_averages(spark):
    """Two skewed batches: the merged avg must weight by row count
    ((1+2+3+100)/4 = 26.5), not average the batch means (26.75)."""
    b1 = spark.createDataFrame([("k", 1.0), ("k", 2.0), ("k", 3.0)], ["g", "v"])
    b2 = spark.createDataFrame([("k", 100.0)], ["g", "v"])
    merged = merge_rollups(
        [rollup_partials(b, ["g"], ["v"]) for b in (b1, b2)], ["g"]
    )
    [r] = rollup_result(merged, ["g"]).collect()
    assert r.v_n == 4 and r.v_avg == 26.5
    assert r.v_min == 1.0 and r.v_max == 100.0 and r.v_sum == 106.0


def test_empty_batch_is_identity(spark, tables):
    orders = tables["orders"]
    whole = rollup_partials(orders, KEYS, MEASURES)
    empty = rollup_partials(orders.limit(0), KEYS, MEASURES)
    assert _canon(merge_rollups([whole, empty], KEYS)) == _canon(whole)
