"""Layout inspection: per-file min/max stats and skipping effectiveness.

OPTIMIZE ZORDER's whole value proposition is that parquet min/max
stats let a predicate skip files. This module makes that measurable:

- :func:`file_stats` — one row per physical file with min/max/count
  for chosen columns (grouped on ``input_file_name()``; a single scan
  of just those columns).
- :func:`skipping_effectiveness` — for an equality/range predicate
  described as (column, lo, hi), the fraction of files whose
  [min, max] interval does NOT intersect it — i.e. the share of the
  table a stats-based reader would never open. 0.0 on a randomly
  laid-out table, → (1 − 1/files) on a perfectly clustered one.

This is the feedback loop for maintenance.zorder_layout /
optimize_clustered: write → measure → decide whether the clustering
pays for the rewrite. Driver-side result size is O(files × cols) —
metadata scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file ``(file, count, min_<c>, max_<c>...)`` for a parquet
    table directory. One scan of only ``cols``."""
    df = spark.read.parquet(path).select(*cols)
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        )
        .withColumnRenamed("_file", "file")
    )


def skipping_effectiveness(
    stats: DataFrame, col: str, lo, hi
) -> float:
    """Fraction of files a min/max-pruning reader skips for the
    predicate ``col BETWEEN lo AND hi`` (use ``lo == hi`` for
    equality). Driver-side arithmetic over the tiny stats relation."""
    total = stats.count()
    if total == 0:
        return 0.0
    overlapping = stats.filter(
        (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
    ).count()
    return (total - overlapping) / total
