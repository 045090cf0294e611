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


# --- count-min frequency sketches ---------------------------------


def _cms_parts(spark):
    from lakehouse_tools_spark.operators.sketches import countmin_sketch

    df = spark.createDataFrame(
        [(i, f"u{i % 7}") for i in range(200)] + [(900 + i, "hot") for i in range(50)],
        ["id", "k"],
    )
    halves = [df.filter(F.col("id") % 2 == i) for i in (0, 1)]
    return df, [countmin_sketch(h, "k", width=64, depth=3) for h in halves]


def test_countmin_never_undercounts(spark):
    """The one-sided CMS guarantee: min-over-rows ≥ true count for
    EVERY key (each counter only ever adds collisions)."""
    from lakehouse_tools_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    df, _ = _cms_parts(spark)
    sk = countmin_sketch(df, "k", width=64, depth=3)
    est = {
        r.key: r.cnt_est
        for r in countmin_estimate(sk, df, "k", width=64, depth=3).collect()
    }
    true = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k], (k, est[k], true[k])


def test_countmin_merge_equals_whole(spark):
    """Summing per-batch counters pointwise IS the whole-data sketch —
    exact integer equality, not an error band (unlike HLL)."""
    from lakehouse_tools_spark.operators.sketches import (
        countmin_sketch,
        merge_countmin,
    )

    df, parts = _cms_parts(spark)
    merged = {
        (r.d, r.bucket): r.cnt for r in merge_countmin(parts).collect()
    }
    whole = {
        (r.d, r.bucket): r.cnt
        for r in countmin_sketch(df, "k", width=64, depth=3).collect()
    }
    assert merged == whole


def test_countmin_missing_key_estimates_small(spark):
    """A key never inserted estimates only its collision mass — with
    64 buckets and 250 rows this stays well under the hot key's
    count, and an empty-bucket key estimates exactly 0 via the
    left-join coalesce."""
    from lakehouse_tools_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    df, _ = _cms_parts(spark)
    sk = countmin_sketch(df, "k", width=64, depth=3)
    probe = df.sparkSession.createDataFrame(
        [("never-seen-key",)], ["k"]
    )
    [row] = countmin_estimate(sk, probe, "k", width=64, depth=3).collect()
    assert 0 <= row.cnt_est < 50
