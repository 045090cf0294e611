"""Fingerprint join pruning (functions/prune.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tools_spark.functions.prune import key_fingerprint, semi_prune


def _sides(spark):
    probe = spark.createDataFrame(
        [(i, f"row{i}") for i in range(500)], ["k", "payload"]
    )
    build = spark.createDataFrame(
        [(i * 7,) for i in range(30)], ["bk"]
    )
    return probe, build


def test_prune_is_transparent_to_the_join(spark):
    """The contract: pruned ⋈ build == probe ⋈ build exactly."""
    probe, build = _sides(spark)
    pruned = semi_prune(probe, "k", build, "bk", num_buckets=256)
    plain = sorted(
        probe.join(build, probe.k == build.bk).select("k", "payload").collect()
    )
    via_prune = sorted(
        pruned.join(build, F.col("k") == F.col("bk"))
        .select("k", "payload")
        .collect()
    )
    assert via_prune == plain


def test_no_false_negatives_even_at_tiny_width(spark):
    """Every joining probe row survives pruning at ANY bucket count —
    collisions only ever keep extra rows."""
    probe, build = _sides(spark)
    for buckets in (2, 16, 256):
        kept = set(
            r.k for r in semi_prune(probe, "k", build, "bk", buckets).collect()
        )
        joining = set(r.bk for r in build.collect()) & set(
            r.k for r in probe.collect()
        )
        assert joining <= kept, buckets


def test_pruning_actually_drops_rows(spark):
    """With enough buckets the false-positive mass is small: ~30
    joining keys out of 500 must not balloon past collisions."""
    probe, build = _sides(spark)
    kept = semi_prune(probe, "k", build, "bk", num_buckets=1 << 16).count()
    # 72 joining rows (0,7,...,203 in range 500 → 29 matches) plus at
    # most a handful of 2^16-bucket collisions among 500 keys
    assert kept <= 40


def test_fingerprint_is_bounded_and_distinct(spark):
    probe, build = _sides(spark)
    fp = key_fingerprint(build, "bk", num_buckets=8)
    rows = fp.collect()
    assert len(rows) <= 8
    assert len({r["__fp_bucket"] for r in rows}) == len(rows)
    assert all(0 <= r["__fp_bucket"] < 8 for r in rows)


def test_multi_column_keys_do_not_concat_collide(spark):
    """("ab","c") and ("a","bc") must fingerprint differently — the
    separator is part of the hashed bytes."""
    a = spark.createDataFrame([("ab", "c")], ["x", "y"])
    b = spark.createDataFrame([("a", "bc")], ["x", "y"])
    fa = key_fingerprint(a, ["x", "y"], num_buckets=1 << 20).collect()
    fb = key_fingerprint(b, ["x", "y"], num_buckets=1 << 20).collect()
    assert fa != fb


def test_prune_happens_before_probe_shuffle(spark):
    """Plan shape: the fingerprint semi-join is a BroadcastHashJoin
    (LeftSemi) with NO exchange on the probe side below it — the
    pruning is map-side, which is its entire value at scale."""
    probe, build = _sides(spark)
    pruned = semi_prune(probe, "k", build, "bk", num_buckets=256)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    probe_side = plan.split("LeftSemi")[1]
    # everything below the semi-join on the streamed side is scan+project
    assert "Exchange hashpartitioning" not in probe_side.split("BroadcastExchange")[0]
