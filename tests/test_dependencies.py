"""Functional-dependency discovery (operators/dependencies)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from lakehouse_tools_spark.operators.dependencies import fd_candidates


def _df(spark):
    # id -> city holds; city -> id does not; id -> zip broken by id=3
    rows = [
        Row(id=1, city="a", zip="11"),
        Row(id=1, city="a", zip="11"),
        Row(id=2, city="a", zip="22"),
        Row(id=3, city="b", zip="33"),
        Row(id=3, city="b", zip="34"),
    ]
    return spark.createDataFrame(rows)


def test_fd_holds_and_fails(spark):
    out = {
        (r.determinant, r.dependent): r
        for r in fd_candidates(
            _df(spark),
            [("id", "city"), ("city", "id"), ("id", "zip")],
        ).collect()
    }
    holds = out[("id", "city")]
    assert (holds.n_det, holds.n_pair, holds.fd_holds) == (3, 3, True)
    assert holds.strength == 1.0
    rev = out[("city", "id")]
    assert (rev.n_det, rev.n_pair, rev.fd_holds) == (2, 3, False)
    broken = out[("id", "zip")]
    assert (broken.n_det, broken.n_pair, broken.fd_holds) == (3, 4, False)
    assert broken.strength == 0.75


def test_fd_null_rows_excluded(spark):
    # NULL determinant/dependent rows drop out of BOTH counts
    # (ANSI COUNT(DISTINCT a, b) semantics), so they can neither
    # make nor break an FD.
    rows = [
        Row(a=1, b="x"),
        Row(a=1, b=None),
        Row(a=None, b="y"),
        Row(a=2, b="z"),
    ]
    out = fd_candidates(
        spark.createDataFrame(rows), [("a", "b")]
    ).collect()[0]
    assert (out.n_det, out.n_pair, out.fd_holds) == (2, 2, True)


def test_fd_approx_mode_tracks_exact_at_fixture_scale(spark, tables):
    orders = tables["orders"]
    exact = {
        (r.determinant, r.dependent): r
        for r in fd_candidates(
            orders, [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")]
        ).collect()
    }
    approx = {
        (r.determinant, r.dependent): r
        for r in fd_candidates(
            orders,
            [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")],
            approx=True,
            rsd=0.02,
        ).collect()
    }
    # key FD: exact says holds; approx's tolerance screen (n_det >=
    # n_pair * (1 - 3*rsd)) must not falsely dismiss it even though
    # the two HLL estimates come from different sketches
    assert exact[("o_orderkey", "o_custkey")].fd_holds
    a = approx[("o_orderkey", "o_custkey")]
    assert a.fd_holds
    assert abs(a.n_det - a.n_pair) <= 0.06 * a.n_pair
    # broken FD: the violation is gross (150 vs 436 at sf0.001) —
    # far outside any HLL error band, so the screen rejects it too
    assert not exact[("o_custkey", "o_orderstatus")].fd_holds
    b = approx[("o_custkey", "o_orderstatus")]
    assert not b.fd_holds
    assert b.n_pair > 1.5 * b.n_det


def test_fd_empty_pairs_raises(spark):
    with pytest.raises(ValueError):
        fd_candidates(_df(spark), [])


def test_fd_exact_single_scan_plan(spark, tables):
    # the whole pair list rides ONE aggregate over ONE scan — the
    # Expand the multi-distinct plan inserts is the known exact-mode
    # cost, but there must not be one scan (or join) per pair.
    plan = fd_candidates(
        tables["orders"],
        [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus")],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
