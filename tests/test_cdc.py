"""CDC change-feed application (operators/cdc.py)."""

from __future__ import annotations

from lakehouse_tools_spark.operators.cdc import apply_changes, apply_changes_into

FEED = [
    # (k, seq, val, op)
    (1, 1, "a", "I"),
    (1, 2, "b", "U"),
    (2, 1, "x", "I"),
    (2, 2, None, "D"),
    (3, 1, "m", "I"),
    (3, 2, None, "D"),
    (3, 3, "m2", "I"),
    (4, 1, "q", "U"),
]
SCHEMA = "k long, seq long, val string, op string"


def _rows(df):
    return {(r.k, r.seq, r.val) for r in df.collect()}


def test_apply_changes_last_op_wins(spark):
    out = apply_changes(
        spark.createDataFrame(FEED, SCHEMA), keys=["k"], sequence_col="seq"
    )
    assert _rows(out) == {(1, 2, "b"), (3, 3, "m2"), (4, 1, "q")}
    assert out.columns == ["k", "seq", "val"]


def test_apply_changes_delete_aliases(spark):
    feed = [(1, 1, "a", "insert"), (1, 2, None, "delete")]
    out = apply_changes(
        spark.createDataFrame(feed, SCHEMA), keys=["k"], sequence_col="seq"
    )
    assert out.count() == 0


def test_apply_changes_into_replaces_deletes_passes_through(spark):
    target = spark.createDataFrame(
        [(1, 0, "old"), (2, 0, "keep-me-not"), (9, 0, "untouched")],
        "k long, seq long, val string",
    )
    out = apply_changes_into(
        target,
        spark.createDataFrame(FEED, SCHEMA),
        keys=["k"],
        sequence_col="seq",
    )
    assert _rows(out) == {
        (1, 2, "b"),
        (3, 3, "m2"),
        (4, 1, "q"),
        (9, 0, "untouched"),
    }


def test_chunked_application_is_associative(spark):
    """apply(apply(∅, A), B) == apply(∅, A+B) for every split point —
    the invariant the driver oracle (single-pass SQL over the full
    feed) relies on."""
    full = apply_changes(
        spark.createDataFrame(FEED, SCHEMA), keys=["k"], sequence_col="seq"
    )
    want = _rows(full)
    for cut in range(1, len(FEED)):
        a = spark.createDataFrame(FEED[:cut], SCHEMA)
        b = spark.createDataFrame(FEED[cut:], SCHEMA)
        got = apply_changes_into(
            apply_changes(a, keys=["k"], sequence_col="seq"),
            b,
            keys=["k"],
            sequence_col="seq",
        )
        assert _rows(got) == want, f"diverged at split {cut}"


def test_tie_on_sequence_is_deterministic(spark):
    feed = [(1, 5, "zz", "U"), (1, 5, "aa", "U")]
    out1 = apply_changes(
        spark.createDataFrame(feed, SCHEMA), keys=["k"], sequence_col="seq"
    )
    out2 = apply_changes(
        spark.createDataFrame(list(reversed(feed)), SCHEMA),
        keys=["k"],
        sequence_col="seq",
    )
    # remaining columns break the tie (desc): "zz" wins in any input order
    assert _rows(out1) == _rows(out2) == {(1, 5, "zz")}


def test_null_op_is_kept_not_silently_deleted(spark):
    """A NULL op on the winning row is an upsert, not a delete:
    ``~op.isin(...)`` alone is NULL for null op and would drop the
    key — silent data loss on malformed feeds."""
    feed = [(1, 1, "x", "I"), (1, 2, "y", None), (2, 1, "z", None)]
    out = apply_changes(
        spark.createDataFrame(feed, SCHEMA), keys=["k"], sequence_col="seq"
    )
    assert _rows(out) == {(1, 2, "y"), (2, 1, "z")}
