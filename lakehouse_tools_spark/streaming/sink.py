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

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from lakehouse_tools_spark.operators.merge import SourcePredicate
from lakehouse_tools_spark.operators.writer import upsert_into


def upsert_stream(
    stream_df: DataFrame,
    table: str,
    keys: list[str],
    checkpoint: str,
    source_residual: SourcePredicate | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Land a streaming DataFrame into ``table`` by keyed upsert.

    ``available_now=True`` drains everything currently available and
    stops (batch-like backfill); ``False`` runs continuously with the
    default micro-batch trigger.
    """

    owner = stream_df.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a micro-batch can contain several versions of one key; keep
        # the last arrival per key so the upsert is deterministic
        deduped = batch_df.dropDuplicates(keys)
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
    stream_df: DataFrame, name: str, output_mode: str = "append"
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
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
