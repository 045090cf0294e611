"""Skew-mitigation helpers: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.RUNTIME_CONFS) handles most
skew at runtime; these are the explicit tools for the cases AQE can't
see — e.g. a hot key that dominates one partition of a shuffle-hash
join, or a high-skew groupBy whose map-side combine is defeated by
cardinality. Salting is deterministic (md5-based, no RNG) so runs are
reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(cols: list[str], buckets: int) -> Column:
    # md5-derived, deterministic; spreads a hot key's rows uniformly
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(buckets),
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has skewed keys: salt the left side by
    a hash of its non-key columns, replicate the (small-ish) right
    side ``buckets`` times, join on keys+salt. Result is identical to
    the plain join; the hot key's rows now land on ``buckets``
    partitions instead of one.
    """
    non_keys = [c for c in left.columns if c not in keys] or keys
    l = left.withColumn("_salt", _salt_of(non_keys, buckets))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l.join(r, keys + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase count/sum aggregation for extreme key skew: partial
    aggregate on (keys, salt), then final aggregate on keys. Output:
    ``keys..., n, sum_<c>...``. Equivalent to a direct groupBy; the
    first exchange hashes (keys, salt) so no single reducer owns a
    hot key's entire volume.
    """
    sum_cols = sum_cols or []
    all_cols = [c for c in df.columns]
    partial = (
        df.withColumn("_salt", _salt_of(all_cols, buckets))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
