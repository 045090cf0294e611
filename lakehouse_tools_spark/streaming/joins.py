"""Stream-stream interval join — correlating two live streams.

The hardest Structured Streaming operator family: joining two
unbounded relations requires BOTH sides to buffer state, and the join
is only tractable when an event-time constraint bounds how long a row
can still find partners. Spark's stream-stream join implements
exactly that: equi-keys + a time-range predicate; each side's
watermark plus the range tells the engine when buffered rows are
dead and can be evicted — state stays proportional to (rate × range),
not to stream history.

This module wires the canonical shape: ``left ⋈ right ON keys AND
right_ts ∈ [left_ts + lower, left_ts + upper]``. The same builder
works on static DataFrames (plans as a normal range-predicate join),
which is what the correctness oracle compares against: in a
single-batch ``availableNow`` run nothing has been evicted when the
join evaluates, so the streaming result equals the batch join
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Inner interval join of two (streaming or static) relations.

    Matches rows with equal ``key`` where ``right_ts`` lies in
    ``[left_ts + lower, left_ts + upper]`` (closed bounds, seconds).
    Column names get side prefixes (key kept once, unprefixed) so the
    two event relations can share a schema. Streaming callers must
    put a watermark on BOTH inputs (``windows.with_watermark``) —
    Spark needs it to bound each side's join state.
    """
    lp, rp = prefixes
    l = left.select(
        F.col(key).alias(key),
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias(f"_rk_{key}"),
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns if c != key],
    )
    cond = (
        (F.col(key) == F.col(f"_rk_{key}"))
        & (
            F.col(f"{rp}{right_ts}")
            >= F.col(f"{lp}{left_ts}") + F.expr(f"INTERVAL {lower_seconds} SECOND")
        )
        & (
            F.col(f"{rp}{right_ts}")
            <= F.col(f"{lp}{left_ts}") + F.expr(f"INTERVAL {upper_seconds} SECOND")
        )
    )
    return l.join(r, cond, "inner").drop(f"_rk_{key}")
