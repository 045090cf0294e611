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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: left columns + the as-of values of
    ``value_cols`` from ``right`` (null when no matching right row).

    ``direction='backward'`` (default) matches the greatest
    ``right_ts <= ts``; ``'forward'`` the smallest ``right_ts >= ts``;
    ``'nearest'`` whichever of the two is closer in time (ties to the
    backward match — pandas ``merge_asof`` semantics)
    — same union-tag plan, the window just sorts descending, so both
    directions cost one shuffle + one sort. ``tolerance_seconds``
    nulls the match when it is further than the tolerance from the
    left timestamp (pandas ``merge_asof`` semantics): the matched
    right timestamp rides along as one extra filled column and the
    bound is a codegen'd post-filter — no second join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    lcols = left.columns
    # the matched right timestamp is carried as a synthetic value
    # column so the tolerance check needs no extra join
    fill_cols = [*value_cols, "__rts"]

    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r___rts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r___rts"),
    ).select(*l.columns)  # align column order for the union

    union = l.unionByName(r)
    # backward sorts time ascending; forward sorts time DESCENDING so
    # "latest preceding" in the sort order is the earliest at-or-after
    # in real time. Right rows sort before left at equal timestamps so
    # an exactly-simultaneous row matches in either direction.
    back_order = [F.col("_ts").asc(), F.col("_side").asc()]
    fwd_order = [F.col("_ts").desc(), F.col("_side").asc()]

    def _fills(order):
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {
            c: F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w)
            for c in fill_cols
        }

    if direction in ("backward", "forward"):
        m = _fills(back_order if direction == "backward" else fwd_order)
        filled = union.select(
            *l.columns, *[m[c].alias(f"_f_{c}") for c in fill_cols]
        )
    else:
        # nearest: fill BOTH directions over the same single shuffle
        # (one exchange on the keys; the two windows each sort) and
        # pick the closer match per row, ties to the backward side —
        # pandas merge_asof(direction='nearest') semantics.
        b, f = _fills(back_order), _fills(fwd_order)
        tmp = union.select(
            *l.columns,
            *[b[c].alias(f"_b_{c}") for c in fill_cols],
            *[f[c].alias(f"_fw_{c}") for c in fill_cols],
        )
        bgap = F.col("_ts").cast("double") - F.col("_b___rts").cast("double")
        fgap = F.col("_fw___rts").cast("double") - F.col("_ts").cast("double")
        use_b = F.col("_fw___rts").isNull() | (
            F.col("_b___rts").isNotNull() & (bgap <= fgap)
        )
        filled = tmp.select(
            *l.columns,
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_fw_{c}"))
                .alias(f"_f_{c}")
                for c in fill_cols
            ],
        )
    out_vals = [F.col(f"_f_{c}") for c in value_cols]
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - F.col("_f___rts").cast("double")
        )
        within = gap <= F.lit(float(tolerance_seconds))
        out_vals = [F.when(within, v) for v in out_vals]
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[v.alias(c) for v, c in zip(out_vals, value_cols)],
    )
