"""Event-rate anomaly detection: per-key z-scores over time buckets.

The monitoring primitive that pages someone when a pipeline's event
rate collapses or spikes: bucket events per key into fixed windows,
then score each bucket against that key's own rate distribution.
Everything after the first groupBy operates on the aggregated
(keys × buckets) relation — metadata-scale even at 100 TB of input —
so the analytic window pass is free; the only data-sized operation
is the initial bucketed count, which combines map-side before its
shuffle.

Deterministic: counts are exact, z-scores floor-truncated to 6, and
the (avg, stddev_samp) moments match the ANSI definitions, so the
verdict is reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_tools_spark.functions.portable import floor6

#: boundary guard for floored z-scores: integer count data makes z an
#: exact 1e-6 multiple often enough that cross-engine last-ulp drift
#: would otherwise flip the floor; 1e-9 is far above double drift
#: (~1e-13 here) and far below any meaningful z difference.
_Z_EPS = 1e-9


def rate_zscores(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "1 hour",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key per-bucket event counts with a z-score against the
    key's own bucket-count distribution.

    Output: ``(key, window_start, n_events, z, is_anomaly)``; ``z``
    is NULL when the key has a single bucket or zero variance
    (stddev_samp undefined/0 — explicitly nulled rather than left to
    engine-specific division semantics).
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"),
        F.window(F.col(ts_col), bucket).alias("_w"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("key")
    std = F.stddev_samp("n_events").over(w)
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.nullif(
        std, F.lit(0.0)
    )
    return counts.select(
        "key",
        F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.col("n_events").cast("long").alias("n_events"),
        # + _Z_EPS before the floor: integer counts routinely make z an
        # EXACT multiple of 1e-6 (e.g. -1.0), where two engines' last-
        # ulp float drift lands on opposite sides of the truncation
        # boundary; the nudge moves the boundary off exact rationals
        floor6(z + _Z_EPS).alias("z"),
        (F.abs(z) >= z_threshold - _Z_EPS).alias("is_anomaly"),
    )


def rolling_zscores(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "1 hour",
    trailing: int = 24,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key z-score of each bucket against its own TRAILING window
    (previous ``trailing`` buckets, current excluded) — the
    production form of rate anomaly detection: a slow drift moves the
    baseline with it, so only genuine level shifts alarm, and the
    score is computable incrementally as new buckets land (unlike
    :func:`rate_zscores`' whole-history moments).

    Same two-tier cost: one data-sized bucketed count (map-side
    combined), then windows over the keys×buckets relation. z is
    NULL until a key has 2 trailing buckets with variance — explicit,
    not engine-divide-by-zero. floor6 for cross-engine exactness.
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"),
        F.window(F.col(ts_col), bucket).alias("_w"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    base = counts.select(
        "key", F.col("_w.start").alias("_ws"), "n_events"
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("_ws").asc())
        .rowsBetween(-trailing, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    z = (F.col("n_events") - mu) / F.nullif(sd, F.lit(0.0))
    return base.select(
        "key",
        F.date_format("_ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("n_events").cast("long").alias("n_events"),
        # same exact-rational boundary guard as rate_zscores
        floor6(z + _Z_EPS).alias("z"),
        (F.abs(z) >= z_threshold - _Z_EPS).alias("is_anomaly"),
    )
