"""Markov transition matrix (operators/sequences)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from lakehouse_tools_spark.operators.sequences import transition_matrix


def _ev(user, minute, etype, eid):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 1, 0, minute),
        user_id=user,
        event_type=etype,
    )


def test_transition_counts_and_probabilities(spark):
    # user 1: a -> b -> a -> b ; user 2: a -> a
    rows = [
        _ev(1, 0, "a", 1),
        _ev(1, 1, "b", 2),
        _ev(1, 2, "a", 3),
        _ev(1, 3, "b", 4),
        _ev(2, 0, "a", 5),
        _ev(2, 1, "a", 6),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_matrix(
            df, "user_id", "event_type", ["ts", "event_id"]
        ).collect()
    }
    # a->b twice, a->a once, b->a once; last event per user emits nothing
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "a")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3


def test_transitions_single_event_key_emits_nothing(spark):
    df = spark.createDataFrame([_ev(9, 0, "z", 1)])
    assert (
        transition_matrix(
            df, "user_id", "event_type", ["ts", "event_id"]
        ).count()
        == 0
    )


def test_pattern_match_counts_and_order(spark):
    from lakehouse_tools_spark.operators.sequences import pattern_match

    # user 1: v c c p v p  -> 'v[cv]*p' matches twice (non-overlapping)
    # user 2: p v c       -> purchase before the view: no match
    # user 3: x only      -> untokenized state drops; key disappears
    rows = [
        _ev(1, 0, "view", 1),
        _ev(1, 1, "click", 2),
        _ev(1, 2, "click", 3),
        _ev(1, 3, "purchase", 4),
        _ev(1, 4, "view", 5),
        _ev(1, 5, "purchase", 6),
        _ev(2, 0, "purchase", 7),
        _ev(2, 1, "view", 8),
        _ev(2, 2, "click", 9),
        _ev(3, 0, "x", 10),
    ]
    tokens = {"view": "v", "click": "c", "purchase": "p"}
    out = {
        r.key: r
        for r in pattern_match(
            spark.createDataFrame(rows),
            "user_id",
            "event_type",
            ["ts", "event_id"],
            "v[cv]*p",
            tokens,
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].n_events, out[1].n_matches, out[1].matched) == (6, 2, True)
    assert (out[2].n_events, out[2].n_matches, out[2].matched) == (3, 0, False)


def test_pattern_match_tiebreaker_orders_equal_timestamps(spark):
    from lakehouse_tools_spark.operators.sequences import pattern_match

    # both events at the same minute: event_id must break the tie,
    # making the sequence 'vp' (a match), never 'pv'
    rows = [_ev(1, 0, "view", 1), _ev(1, 0, "purchase", 2)]
    out = pattern_match(
        spark.createDataFrame(rows),
        "user_id",
        "event_type",
        ["ts", "event_id"],
        "vp",
        {"view": "v", "purchase": "p"},
    ).collect()[0]
    assert (out.n_matches, out.matched) == (1, True)


def test_pattern_match_rejects_multichar_token(spark):
    import pytest as _pytest

    from lakehouse_tools_spark.operators.sequences import pattern_match

    df = spark.createDataFrame([_ev(1, 0, "view", 1)])
    with _pytest.raises(ValueError, match="one char"):
        pattern_match(
            df, "user_id", "event_type", ["ts", "event_id"], "v", {"view": "vv"}
        )


def test_pattern_match_null_order_key_excluded(spark):
    """A tokenized row with a NULL order key is excluded from the
    sequence AND from n_events (Spark sorts NULL struct fields first,
    ANSI ORDER BY defaults last — exclusion is the one semantics both
    engines agree on; see the docstring contract)."""
    from lakehouse_tools_spark.operators.sequences import pattern_match

    rows = [
        _ev(1, 0, "view", 1),
        _ev(1, 1, "purchase", 2),
        # null ts: without the exclusion this 'p' would sort FIRST in
        # Spark (sequence 'pvp', 1 match) but LAST in the oracle
        # ('vpp', 1 match at a different position) — with it, both see 'vp'
        Row(event_id=3, ts=None, user_id=1, event_type="purchase"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, event_type string"
    )
    [out] = pattern_match(
        df,
        "user_id",
        "event_type",
        ["ts", "event_id"],
        "v[cv]*p",
        {"view": "v", "click": "c", "purchase": "p"},
    ).collect()
    assert (out.n_events, out.n_matches, out.matched) == (2, 1, True)
