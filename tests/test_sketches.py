"""Mergeable HLL distinct sketches (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.sketches import (
    distinct_sketches,
    estimate_distinct,
    merge_sketches,
)


def _est(df):
    return {r.columnName: r.n_distinct_est for r in df.collect()}


def _close(a: dict, b: dict, tol: float = 0.03) -> bool:
    assert set(a) == set(b)
    return all(abs(a[k] - b[k]) <= max(2, tol * max(a[k], b[k])) for k in a)


def test_union_of_batches_matches_whole(spark, tables):
    """The mergeability law — the whole point of sketches: building
    per-batch and merging answers like one pass over everything.
    DataSketches sketches promote sparse→dense lazily, so unions of
    differently-built sketches can differ in the last ulp of the
    estimate — the contract is closeness (within twice the lg_k=12
    RSE of ~1.6%), not register equality."""
    orders = tables["orders"]
    half1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    half2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = merge_sketches(
        [distinct_sketches(half1), distinct_sketches(half2)]
    )
    whole = merge_sketches([distinct_sketches(orders)])
    assert _close(_est(estimate_distinct(merged)), _est(estimate_distinct(whole)))


def test_estimates_close_to_exact(spark, tables):
    orders = tables["orders"]
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    est = _est(estimate_distinct(distinct_sketches(orders, cols)))
    for c in cols:
        exact = orders.select(c).distinct().count()
        assert abs(est[c] - exact) <= max(2, 0.05 * exact), (c, est[c], exact)


def test_partitioning_changes_estimate_within_error_band(spark, tables):
    orders = tables["orders"]
    a = distinct_sketches(orders.repartition(3))
    b = distinct_sketches(orders.repartition(17))
    assert _close(
        _est(estimate_distinct(merge_sketches([a]))),
        _est(estimate_distinct(merge_sketches([b]))),
    )


def test_empty_batch_is_identity(spark, tables):
    orders = tables["orders"]
    empty = orders.filter(F.lit(False))
    with_empty = merge_sketches(
        [distinct_sketches(orders), distinct_sketches(empty)]
    )
    alone = merge_sketches([distinct_sketches(orders)])
    assert _est(estimate_distinct(with_empty)) == _est(estimate_distinct(alone))
