"""Pivot / melt reshape operators (operators/reshape.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.reshape import melt, pivot_counts


def test_pivot_counts_with_zero_fill(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "g long, t string"
    )
    got = {
        (r.g, r.a, r.b, r.c)
        for r in pivot_counts(df, "g", "t", ["a", "b", "c"]).collect()
    }
    assert got == {(1, 2, 1, 0), (2, 0, 1, 0)}  # absent cells are 0


def test_pivot_sums(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 5), (1, "b", 2)], "g long, t string, v long"
    )
    r = pivot_counts(df, "g", "t", ["a", "b"], agg_col="v").collect()[0]
    assert (r.a, r.b) == (15, 2)


def test_pivot_explicit_values_no_distinct_job(spark):
    # values outside the list are dropped, not discovered
    df = spark.createDataFrame([(1, "a"), (1, "zzz")], "g long, t string")
    out = pivot_counts(df, "g", "t", ["a"])
    assert out.columns == ["g", "a"]
    assert out.collect()[0].a == 1


def test_melt_roundtrips_pivot(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "g long, t string"
    )
    wide = pivot_counts(df, "g", "t", ["a", "b"])
    long = melt(wide, ["g"], ["a", "b"], "t", "cnt")
    got = {(r.g, r.t, r.cnt) for r in long.collect()}
    assert got == {(1, "a", 2), (1, "b", 0), (2, "a", 0), (2, "b", 1)}


def test_melt_is_shuffle_free_and_validates(spark):
    df = spark.createDataFrame([(1, 2, 3)], "g long, x long, y long")
    plan = (
        melt(df, ["g"], ["x", "y"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        melt(df, ["g"], [])
