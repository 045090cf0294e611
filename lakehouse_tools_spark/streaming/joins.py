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
    how: str = "inner",
) -> DataFrame:
    """Interval join of two (streaming or static) relations.

    Matches rows with equal ``key`` where ``right_ts`` lies in
    ``[left_ts + lower, left_ts + upper]`` (closed bounds, seconds).
    Column names get side prefixes (key kept once, unprefixed) so the
    two event relations can share a schema. Streaming callers must
    put a watermark on BOTH inputs (``windows.with_watermark``) —
    Spark needs it to bound each side's join state.

    ``how='left_outer'`` adds the unmatched-left rows with nulls on
    the right — streaming semantics differ from the batch left join:
    a null-padded row is emitted only once the LEFT row's state is
    provably closed (the watermark has passed the latest right
    event-time that could still match it, ``left_ts + upper``);
    left rows younger than that stay buffered and produce nothing in
    a drained run. The batch oracle must encode that cut.
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
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    return l.join(r, cond, how).drop(f"_rk_{key}")


def flush_sentinel_union(stream_df: DataFrame, values: dict, path: str) -> DataFrame:
    """Union a one-row far-future "flush" sentinel onto a streaming
    relation, so a drained (``availableNow``) run provably evicts all
    real state.

    Stateful streaming results that depend on eviction — outer-join
    null rows, final session windows — are emitted only once the
    watermark passes each row's closing point, and the margin Spark
    derives from the join condition makes the exact cut awkward to
    encode in an oracle. A sentinel event dated far beyond every real
    event (years, versus margins of hours) drives the final watermark
    past EVERY real row's closing point, so the drained streaming
    result equals the plain batch semantics exactly — that's the
    contract this helper buys. Add one to EVERY watermarked input
    (the global watermark is the min across them); give sentinels
    impossible join keys and filter them from the output. The
    sentinel itself stays in state forever by construction.

    ``values`` must cover every column of ``stream_df``; the row is
    written as a one-file parquet directory at ``path`` (caller-owned
    temp dir) and unioned as a second file-stream source.
    """
    spark = stream_df.sparkSession
    schema = stream_df.schema
    missing = [f.name for f in schema.fields if f.name not in values]
    if missing:
        raise ValueError(f"sentinel values missing columns: {missing}")
    row = tuple(values[f.name] for f in schema.fields)
    spark.createDataFrame([row], schema).write.mode("overwrite").parquet(path)
    sent = spark.readStream.schema(schema).parquet(path)
    return stream_df.unionByName(sent)
