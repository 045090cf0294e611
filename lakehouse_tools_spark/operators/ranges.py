"""Range (interval) join via bucket binning.

Spark has no native range-join operator (a point-in-interval join
with no equi key would plan as BroadcastNestedLoopJoin or a cartesian
product — O(n·m) comparisons). The standard scale technique, used
here, is *interval binning*: quantize time into fixed buckets,
explode each interval across the buckets it covers, and equi-join on
the bucket id with the true range predicate as a residual. Candidate
pairs are then ∝ (points per bucket) × (intervals per bucket) —
local density, not global size — and the equi-join shuffles,
broadcasts, and AQE-skew-splits like any other join.

Correctness shape: a point lives in exactly ONE bucket, so no
post-join dedup is needed; an interval [s, e] explodes to
floor(e/w) − floor(s/w) + 1 rows, so pick ``bucket_seconds`` near the
typical interval length (wider → fewer duplicate interval rows,
narrower → fewer false candidates per bucket).

The reference has no joins beyond MERGE (SURVEY.md §2.4); this is
part of the extension surface (§7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row containing them.

    Emits ``points ⋈ intervals`` where
    ``start_col <= ts_col <= end_col`` (closed bounds), optionally
    also equi-matching ``extra_keys`` (e.g. a user id — present on
    both sides). Column names must be disjoint apart from
    ``extra_keys``.

    Monotonicity of floor guarantees the binned equi-join is a
    superset of the true range join, so the residual filter is exact:
    s <= t <= e ⇒ floor(s/w) <= floor(t/w) <= floor(e/w).

    ``how`` is ``inner`` or ``left`` (points preserved). The range
    residual lives INSIDE the join condition — a post-join filter
    would silently drop ``left``'s null-extended rows and degenerate
    it to inner. ``left`` needs no dedup because a point lives in
    exactly one bucket (one left row per input point). ``right``/
    ``full`` are rejected: the interval side is exploded per bucket,
    so its unmatched rows would null-extend once per covered bucket
    and need an extra dedup pass nothing here wants to pay for.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: only 'inner' and 'left' are supported "
            "(interval rows are exploded per bucket, so right/full "
            "would duplicate unmatched intervals)"
        )
    w = F.lit(int(bucket_seconds))
    p = points.withColumn(
        "_rbucket", F.floor(F.col(ts_col).cast("long") / w).cast("long")
    )
    iv = intervals.withColumn(
        "_rbucket_iv",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / w).cast("long"),
                F.floor(F.col(end_col).cast("long") / w).cast("long"),
            )
        ),
    )
    # interval-side copies of the equi keys, so the join condition can
    # be a single expression (equi part extracted by Catalyst, range
    # part kept as the join residual)
    for k in extra_keys:
        iv = iv.withColumnRenamed(k, f"_iv_{k}")
    cond = F.col("_rbucket") == F.col("_rbucket_iv")
    for k in extra_keys:
        cond = cond & (F.col(k) == F.col(f"_iv_{k}"))
    cond = (
        cond
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    joined = p.join(iv, cond, how)
    return joined.drop("_rbucket", "_rbucket_iv", *[f"_iv_{k}" for k in extra_keys])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair
    whose closed intervals intersect (``l_start <= r_end AND
    r_start <= l_end``), optionally also equi-matched on
    ``extra_keys``. The genomics/campaign-attribution shape Spark
    would otherwise plan as a nested-loop cross product.

    Both sides explode across their covered buckets and equi-join on
    the bucket id; each overlapping pair is emitted EXACTLY once via
    the owner-bucket rule: the pair is kept only in the bucket of
    ``max(l_start, r_start)``. Overlap means
    ``max(starts) <= min(ends)``, so that bucket is covered by BOTH
    intervals — it always survives the equi-join — and it is unique
    by construction, so no dedup pass is needed. Candidates are ∝
    per-bucket density (local, AQE-splittable), never global n·m.
    Column names must be disjoint apart from ``extra_keys``.
    """
    w = F.lit(int(bucket_seconds))
    l = left.withColumn(
        "_ob_l",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start).cast("long") / w).cast("long"),
                F.floor(F.col(left_end).cast("long") / w).cast("long"),
            )
        ),
    )
    r = right
    for k in extra_keys:
        r = r.withColumnRenamed(k, f"_iv_{k}")
    r = r.withColumn(
        "_ob_r",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("long") / w).cast("long"),
                F.floor(F.col(right_end).cast("long") / w).cast("long"),
            )
        ),
    )
    owner = F.floor(
        F.greatest(
            F.col(left_start).cast("long"), F.col(right_start).cast("long")
        )
        / w
    ).cast("long")
    cond = F.col("_ob_l") == F.col("_ob_r")
    for k in extra_keys:
        cond = cond & (F.col(k) == F.col(f"_iv_{k}"))
    cond = (
        cond
        & (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (F.col("_ob_l") == owner)
    )
    return l.join(r, cond, "inner").drop(
        "_ob_l", "_ob_r", *[f"_iv_{k}" for k in extra_keys]
    )
