"""Snapshot diff / change-data-feed (operators/diff.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.diff import snapshot_diff

DDL = "k long, v string, w long"


def _diff(spark, old, new, **kw):
    return {
        (r._change_type, r.k, r.v, r.w)
        for r in snapshot_diff(
            spark.createDataFrame(old, DDL), spark.createDataFrame(new, DDL), ["k"], **kw
        ).collect()
    }


def test_insert_update_delete(spark):
    got = _diff(
        spark,
        old=[(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        new=[(2, "b", 21), (3, "c", 30), (4, "d", 40)],
    )
    assert got == {
        ("delete", 1, "a", 10),
        ("update_preimage", 2, "b", 20),
        ("update_postimage", 2, "b", 21),
        ("insert", 4, "d", 40),
    }  # unchanged key 3 emits nothing


def test_null_values_compare_null_safe(spark):
    got = _diff(
        spark,
        old=[(1, None, 10), (2, "x", None)],
        new=[(1, None, 10), (2, "x", 5)],
    )
    assert got == {
        ("update_preimage", 2, "x", None),
        ("update_postimage", 2, "x", 5),
    }


def test_compare_cols_narrows_update_definition(spark):
    got = _diff(
        spark,
        old=[(1, "a", 10)],
        new=[(1, "CHANGED", 10)],
        compare_cols=["w"],  # v is ignored
    )
    assert got == set()


def test_empty_diff_and_schema_mismatch(spark):
    rows = [(1, "a", 10)]
    assert _diff(spark, rows, rows) == set()
    with pytest.raises(ValueError):
        snapshot_diff(
            spark.createDataFrame(rows, DDL),
            spark.createDataFrame([(1, "a")], "k long, v string"),
            ["k"],
        )
    with pytest.raises(ValueError):
        snapshot_diff(
            spark.createDataFrame(rows, DDL),
            spark.createDataFrame(rows, DDL),
            ["k"],
            compare_cols=["k"],
        )


def test_single_join_plan(spark):
    old = spark.createDataFrame([(1, "a", 10)], DDL)
    new = spark.createDataFrame([(1, "a", 11)], DDL)
    plan = (
        snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1  # one full-outer join, one pass per side


def test_diff_feed_apply_roundtrip(spark, tables):
    """apply(old, feed(diff(old,new))) == new — the ship-diffs-not-
    snapshots law, covering inserts, updates, and deletes at once."""
    from lakehouse_tools_spark.operators.cdc import apply_changes_into
    from lakehouse_tools_spark.operators.diff import snapshot_diff, to_change_feed

    cust = tables["customer"].select("c_custkey", "c_name", "c_acctbal")
    old = cust.filter(F.col("c_custkey") % 5 != 0)          # deletes: %5==0 in new only... 
    new = (
        cust.filter(F.col("c_custkey") % 7 != 0)            # deletes: %7==0 present in old
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10).otherwise(F.col("c_acctbal")),
        )
    )
    feed = to_change_feed(snapshot_diff(old, new, ["c_custkey"]), sequence=7)
    rebuilt = apply_changes_into(old, feed, ["c_custkey"], "_seq")
    assert sorted(rebuilt.collect()) == sorted(new.collect())


def test_to_change_feed_shape(spark, tables):
    from lakehouse_tools_spark.operators.diff import (
        CHANGE_COL,
        snapshot_diff,
        to_change_feed,
    )

    cust = tables["customer"].select("c_custkey", "c_acctbal")
    old = cust.filter(F.col("c_custkey") <= 100)
    new = cust.filter(F.col("c_custkey") >= 50).withColumn(
        "c_acctbal", F.col("c_acctbal") * 2
    )
    feed = to_change_feed(snapshot_diff(old, new, ["c_custkey"]), sequence=3)
    assert CHANGE_COL not in feed.columns
    ops = {r.op for r in feed.select("op").distinct().collect()}
    assert ops == {"U", "D"}
    assert feed.filter(F.col("_seq") != 3).count() == 0
