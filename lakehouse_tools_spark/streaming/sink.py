"""Streaming sink into the durable table layer.

Structured Streaming's file sinks are append-only; landing a stream
into a keyed table (the reference's MERGE INTO contract, SURVEY.md
§2.4 J1) needs ``foreachBatch``: each micro-batch is a plain batch
DataFrame handed to :func:`operators.writer.upsert_into`, so the
stream inherits the batch path's semantics exactly — matched keys
overwritten, unmatched inserted, atomic blue/green swap per batch.

Exactly-once: foreachBatch is *at-least-once* (a batch can be
replayed after a crash before the checkpoint commits), but upsert by
key is idempotent — replaying batch N re-writes the same rows — so
the combination is effectively exactly-once for keyed upserts. The
checkpoint directory tracks source progress; pass a stable path to
resume across restarts.

At scale each micro-batch rewrite costs one full-outer join against
the target (parquet backend). With delta-spark present, swap
``upsert_into``'s body for ``DeltaTable.merge`` and this sink is
unchanged — that is the point of routing streams through the batch
writer instead of a bespoke streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouse_tools_spark.operators.merge import SourcePredicate
from lakehouse_tools_spark.operators.writer import upsert_into


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """One row per key, chosen *deterministically*.

    ``dropDuplicates(keys)`` keeps whichever row a partition happens to
    deliver first — a replayed micro-batch could keep a different
    version of a key, which would break the idempotent-replay argument
    the streaming sink depends on. Instead rank with ``row_number``
    over a total order: ``order_by`` columns descending (newest wins —
    pass the event-time column), then every remaining non-key column
    descending as tiebreak so the order is total even when ``order_by``
    ties. Same shuffle as ``dropDuplicates`` (one hash partition on the
    keys), so determinism is free at scale.
    """
    order_by = list(order_by or [])
    tiebreak = [c for c in df.columns if c not in keys and c not in order_by]
    order_cols = [F.col(c).desc_nulls_last() for c in order_by + tiebreak]
    if not order_cols:
        # every column is a key: duplicates are identical rows
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_stream(
    stream_df: DataFrame,
    table: str,
    keys: list[str],
    checkpoint: str,
    source_residual: SourcePredicate | None = None,
    available_now: bool = True,
    order_by: list[str] | None = None,
) -> StreamingQuery:
    """Land a streaming DataFrame into ``table`` by keyed upsert.

    ``available_now=True`` drains everything currently available and
    stops (batch-like backfill); ``False`` runs continuously with the
    default micro-batch trigger. ``order_by`` names the column(s)
    defining "newest" when a micro-batch carries several versions of
    one key (typically the event-time column); the winner is picked by
    :func:`latest_per_key`, so a replayed batch keeps the *same*
    version — that determinism is what upgrades at-least-once replay
    into effectively-exactly-once for keyed upserts.
    """

    owner = stream_df.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a micro-batch can contain several versions of one key; keep
        # the newest per key, deterministically, so replay is idempotent
        deduped = latest_per_key(batch_df, keys, order_by)
        upsert_into(batch_df.sparkSession, table, deduped, keys, source_residual)
        # the swap ran in the micro-batch's cloned session; the session
        # that owns the stream has its own relation cache and would
        # keep resolving the table to the replaced files
        owner.catalog.refreshTable(table)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    release_terminated: bool = True,
) -> DataFrame:
    """Drain a streaming DataFrame to completion (``availableNow``)
    into an in-memory sink table and return it as a batch DataFrame.

    In ``append`` mode with a watermark, only windows the final
    watermark has passed (window.end <= max event time − delay) are
    emitted — i.e. the result *observably encodes* the late-data
    policy, which is what makes a one-shot streaming run testable
    against a batch oracle. ``availableNow`` runs a trailing no-data
    batch precisely so that the final watermark advance flushes
    everything it owes.

    .. warning:: **Session-global side effect.** With
       ``release_terminated=True`` (default) this calls
       ``spark.streams.resetTerminated()`` after the drain, which
       clears **every** terminated query from the session's shared
       :class:`StreamingQueryManager` — not just this one. A
       concurrent caller blocked in ``awaitAnyTermination()`` in the
       same session can miss a termination it was waiting to
       observe. Pass ``release_terminated=False`` in sessions that
       use ``awaitAnyTermination()``; the trade-off is that each
       drained query's runtime state then stays pinned by the
       manager for the session's lifetime (measured: repeated sf5
       sessionize drains sit flat ~34 s with the release vs climbing
       past 120 s by the 8th drain without it — SCALING.md,
       streaming curve attribution).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if release_terminated:
        # drop the manager's reference to the terminated drain: the
        # StreamingQueryManager otherwise pins every finished query's
        # runtime state for awaitAnyTermination() — which a
        # drain-style caller never uses — and a long-lived driver
        # session that drains many one-shot queries (the bench/driver
        # harness runs ~10 per session) accumulates them without
        # bound. The memory-sink table itself is unaffected — it
        # lives in the catalog until replaced by name. NOTE this is
        # session-global (see docstring warning).
        stream_df.sparkSession.streams.resetTerminated()
    return stream_df.sparkSession.table(name)
