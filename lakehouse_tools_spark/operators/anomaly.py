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
        floor6(z).alias("z"),
        (F.abs(z) >= z_threshold).alias("is_anomaly"),
    )
