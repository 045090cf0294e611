"""Snapshot diff / change-data-feed (operators/diff.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

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
