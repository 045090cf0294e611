"""SCD Type 2 dimension maintenance (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.scd import scd2_apply, scd2_at, scd2_init

DDL = "k long, v string"
T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _rows(df):
    return {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in df.collect()
    }


def test_init_then_change_insert_unchanged(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a"), (2, "b")], DDL), T0)
    snap = spark.createDataFrame([(1, "a2"), (2, "b"), (3, "c")], DDL)
    out = scd2_apply(dim, snap, ["k"], T1)
    assert _rows(out) == {
        (1, "a", T0, T1, False),   # closed old version
        (1, "a2", T1, None, True), # new version
        (2, "b", T0, None, True),  # unchanged, untouched
        (3, "c", T1, None, True),  # new key
    }


def test_second_apply_preserves_history(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a")], DDL), T0)
    dim = scd2_apply(dim, spark.createDataFrame([(1, "b")], DDL), ["k"], T1)
    dim = scd2_apply(dim, spark.createDataFrame([(1, "c")], DDL), ["k"], T2)
    assert _rows(dim) == {
        (1, "a", T0, T1, False),
        (1, "b", T1, T2, False),
        (1, "c", T2, None, True),
    }


def test_close_missing(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a"), (2, "b")], DDL), T0)
    snap = spark.createDataFrame([(1, "a")], DDL)
    kept = scd2_apply(dim, snap, ["k"], T1)
    assert (2, "b", T0, None, True) in _rows(kept)
    closed = scd2_apply(dim, snap, ["k"], T1, close_missing=True)
    assert (2, "b", T0, T1, False) in _rows(closed)


def test_point_in_time_lookup(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a")], DDL), T0)
    dim = scd2_apply(dim, spark.createDataFrame([(1, "b")], DDL), ["k"], T1)
    before = {(r.k, r.v) for r in scd2_at(dim, dt.datetime(2024, 1, 15)).collect()}
    after = {(r.k, r.v) for r in scd2_at(dim, dt.datetime(2024, 2, 15)).collect()}
    at_boundary = {(r.k, r.v) for r in scd2_at(dim, T1).collect()}
    assert before == {(1, "a")}
    assert after == {(1, "b")} and at_boundary == {(1, "b")}  # half-open


def test_apply_is_idempotent(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a"), (2, "b")], DDL), T0)
    snap = spark.createDataFrame([(1, "a2"), (2, "b")], DDL)
    once = scd2_apply(dim, snap, ["k"], T1)
    twice = scd2_apply(once, snap, ["k"], T1)
    assert _rows(once) == _rows(twice)


def test_schema_validation(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a")], DDL), T0)
    with pytest.raises(ValueError):
        scd2_apply(dim.drop("is_current"), spark.createDataFrame([(1, "a")], DDL), ["k"], T1)
    with pytest.raises(ValueError):
        scd2_apply(dim, spark.createDataFrame([(1, "a", 2)], "k long, v string, w long"), ["k"], T1)
    with pytest.raises(ValueError):
        scd2_apply(dim, spark.createDataFrame([(1, "a")], DDL), ["k"], T1, compare_cols=["k"])


def test_single_join_plan(spark):
    dim = scd2_init(spark.createDataFrame([(1, "a")], DDL), T0)
    snap = spark.createDataFrame([(1, "b")], DDL)
    plan = (
        scd2_apply(dim, snap, ["k"], T1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
