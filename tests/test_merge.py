"""MERGE upsert semantics (reference J1, dbc cell@8.5/8.75)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from lakehouse_tools_spark.operators.merge import not_in, upsert


def rows(df):
    return sorted((r[0] if r[0] is not None else "<null>", r[1]) for r in df.collect())


def test_update_insert_keep(spark):
    t = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    s = spark.createDataFrame([Row(k="b", v=20), Row(k="c", v=30)])
    assert rows(upsert(t, s, ["k"])) == [("a", 1), ("b", 20), ("c", 30)]


def test_residual_failers_are_inserted_not_matched(spark):
    # The reference's NOT IN lives in the ON clause: a source row with
    # an excluded key never matches, but is still INSERTed — observed
    # '' / 'Not partitioned' rows in the stored run (dbc results@11.0).
    t = spark.createDataFrame([Row(k="a", v=1), Row(k="", v=2)])
    s = spark.createDataFrame(
        [Row(k="a", v=10), Row(k="", v=20), Row(k="Not partitioned", v=30)]
    )
    out = upsert(t, s, ["k"], not_in("k", ["", "Not partitioned"]))
    assert rows(out) == [("", 2), ("", 20), ("Not partitioned", 30), ("a", 10)]


def test_chained_merge(spark):
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="a", v=2), Row(k="b", v=3)])
    once = upsert(t, s, ["k"])
    twice = upsert(once, s, ["k"])
    assert rows(once) == rows(twice) == [("a", 2), ("b", 3)]


def test_null_keys_match_null_safe(spark):
    t = spark.createDataFrame([(None, 1), ("x", 2)], "k string, v bigint")
    s = spark.createDataFrame([(None, 10)], "k string, v bigint")
    assert rows(upsert(t, s, ["k"])) == [("<null>", 10), ("x", 2)]


def test_empty_target_inserts_all(spark):
    t = spark.createDataFrame([], "k string, v bigint")
    s = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    assert rows(upsert(t, s, ["k"])) == [("a", 1), ("b", 2)]


def test_schema_mismatch_raises(spark):
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="a", w=1)])
    with pytest.raises(ValueError, match="schemas differ"):
        upsert(t, s, ["k"])


def test_duplicate_source_keys_detected(spark):
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="a", v=2), Row(k="a", v=3)])
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert(t, s, ["k"], check_source_unique=True)


def test_merge_is_single_join(spark):
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="a", v=2)])
    plan = upsert(t, s, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1


def test_full_sync_deletes_target_only_rows(spark):
    # WHEN NOT MATCHED BY SOURCE THEN DELETE: with no delete
    # condition the merged relation mirrors the source exactly
    t = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2), Row(k="z", v=9)])
    s = spark.createDataFrame([Row(k="b", v=20), Row(k="c", v=30)])
    out = upsert(t, s, ["k"], full_sync=True)
    assert rows(out) == [("b", 20), ("c", 30)] == rows(s)


def test_full_sync_conditional_delete_protects_rows(spark):
    # Delta's WHEN NOT MATCHED BY SOURCE AND cond THEN DELETE: only
    # unmatched target rows satisfying the condition are dropped —
    # the per-database stale-row cleanup the reference's To-Do needs
    t = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="b", v=2), Row(k="z", v=9), Row(k="y", v=8)]
    )
    s = spark.createDataFrame([Row(k="b", v=20)])
    out = upsert(
        t, s, ["k"], full_sync=True, delete_condition=lambda tt: tt["k"] > "x"
    )
    # z/y unmatched AND >x -> deleted; a unmatched but <=x -> kept
    assert rows(out) == [("a", 1), ("b", 20)]


def test_full_sync_idempotent(spark):
    t = spark.createDataFrame([Row(k="a", v=1), Row(k="z", v=9)])
    s = spark.createDataFrame([Row(k="a", v=10), Row(k="c", v=30)])
    once = upsert(t, s, ["k"], full_sync=True)
    twice = upsert(once, s, ["k"], full_sync=True)
    assert rows(once) == rows(twice) == [("a", 10), ("c", 30)]


def test_full_sync_eliminates_full_outer_join(spark):
    # unconditional full_sync is null-rejecting on the source side:
    # Catalyst must downgrade the full outer to a right outer join
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="b", v=2)])
    plan = (
        upsert(t, s, ["k"], full_sync=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "FullOuter" not in plan, plan


def test_residual_rerun_duplicates_excluded_keys(spark):
    # Faithful re-run semantics (dbc cell@8.5 ON-clause NOT IN): an
    # excluded-key row already in the target can never be matched by
    # the next run, so each run INSERTs it again — upsert with a
    # residual is idempotent only for keys passing the residual.
    t = spark.createDataFrame([Row(k="a", v=1)])
    s = spark.createDataFrame([Row(k="a", v=10), Row(k="Not partitioned", v=30)])
    once = upsert(t, s, ["k"], not_in("k", ["", "Not partitioned"]))
    twice = upsert(once, s, ["k"], not_in("k", ["", "Not partitioned"]))
    assert rows(twice) == [
        ("Not partitioned", 30),
        ("Not partitioned", 30),
        ("a", 10),
    ]
    # without a residual the same re-run is a pure idempotent upsert
    assert rows(upsert(upsert(t, s, ["k"]), s, ["k"])) == rows(upsert(t, s, ["k"]))


def test_upsert_evolve_schema(spark):
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.merge import upsert

    target = spark.createDataFrame(
        [Row(k=1, a="t1", b="keep1"), Row(k=2, a="t2", b="keep2")]
    )
    source = spark.createDataFrame(
        [Row(k=2, a="s2", c="new2"), Row(k=3, a="s3", c="new3")]
    )
    out = {r.k: r for r in upsert(
        target, source, ["k"], evolve_schema=True
    ).collect()}
    # untouched target row: original values, new column null
    assert out[1].a == "t1" and out[1].b == "keep1" and out[1].c is None
    # matched row: source values for shared cols, target-only RETAINED
    assert out[2].a == "s2" and out[2].b == "keep2" and out[2].c == "new2"
    # inserted row: source values, target-only null
    assert out[3].a == "s3" and out[3].b is None and out[3].c == "new3"
    # column order: target columns then appended source-new columns
    cols = upsert(target, source, ["k"], evolve_schema=True).columns
    assert cols == ["k", "a", "b", "c"]


def test_upsert_schema_mismatch_still_raises_by_default(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.merge import upsert

    t = spark.createDataFrame([Row(k=1, a="x")])
    s = spark.createDataFrame([Row(k=1, c="y")])
    with _pytest.raises(ValueError, match="schemas differ"):
        upsert(t, s, ["k"])
    with _pytest.raises(ValueError, match="must exist in both"):
        upsert(t, s, ["a"], evolve_schema=True)
