"""As-of (point-in-time) join — an operator Spark's joins don't
express directly.

For each left row ``(keys, ts)`` find the single right row with the
same keys and the greatest ``right_ts <= ts``. The classic need:
joining events to the dimension version that was current when the
event happened (SCD-2 lookups, mark-to-market, feature snapshots).

Implementation is the scalable union-tag formulation, NOT a per-key
correlated subquery:

    union(left tagged side=1, right tagged side=0)
    → single shuffle on keys
    → window last_value(right value cols ignoring nulls)
        over (partition by keys order by ts, side)
    → keep left rows

One shuffle + one sort regardless of row counts on either side —
the same cost as a sort-merge join, with no range-explosion. Rows
ordering: at equal timestamps the right row sorts first (side 0), so
a dimension update effective AT the event time is visible to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: left columns + the latest-at-or-before values
    of ``value_cols`` from ``right`` (null when no prior right row).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    lcols = left.columns

    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*l.columns)  # align column order for the union

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *l.columns,
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
    )
