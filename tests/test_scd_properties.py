"""Property-based temporal laws for SCD Type 2 (hypothesis).

The invariants that make a versioned dimension trustworthy:

- present-time law: after applying snapshot S at time T with
  full-snapshot semantics, the point-in-time slice AT T is exactly S.
- history immutability: applying a snapshot never changes what the
  dimension looked like at any time BEFORE T.
- round-trip: applying the current slice back is a no-op.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_tools_spark.operators.scd import scd2_apply, scd2_at, scd2_init

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)
BEFORE_T1 = dt.datetime(2024, 1, 15)

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.one_of(st.none(), st.text(alphabet="ab", max_size=2))
SNAP = st.dictionaries(KEYS, VALS, max_size=5)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, d):
    rows = [(k, v) for k, v in sorted(d.items())]
    return spark.createDataFrame(rows or [(0, "")], "k long, v string").limit(
        len(rows)
    )


def _slice(dim, t):
    return {r.k: r.v for r in scd2_at(dim, t).collect()}


@_settings
@given(s0=SNAP, s1=SNAP)
def test_present_time_slice_equals_snapshot(spark, s0, s1):
    dim = scd2_init(_df(spark, s0), T0)
    dim = scd2_apply(dim, _df(spark, s1), ["k"], T1, close_missing=True)
    assert _slice(dim, T1) == s1
    assert _slice(dim, T2) == s1  # open-ended current versions


@_settings
@given(s0=SNAP, s1=SNAP)
def test_history_is_immutable(spark, s0, s1):
    dim = scd2_init(_df(spark, s0), T0)
    before = _slice(dim, BEFORE_T1)
    applied = scd2_apply(dim, _df(spark, s1), ["k"], T1, close_missing=True)
    assert _slice(applied, BEFORE_T1) == before == s0


@_settings
@given(s0=SNAP)
def test_reapplying_current_slice_is_noop(spark, s0):
    dim = scd2_init(_df(spark, s0), T0)
    again = scd2_apply(dim, _df(spark, s0), ["k"], T1, close_missing=True)
    rows_a = {tuple(r) for r in dim.collect()}
    rows_b = {tuple(r) for r in again.collect()}
    assert rows_a == rows_b
