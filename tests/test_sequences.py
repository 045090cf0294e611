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
