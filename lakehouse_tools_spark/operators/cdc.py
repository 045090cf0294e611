"""CDC change-feed application — reconstruct table state from a
stream of keyed INSERT/UPDATE/DELETE change rows.

The reference's MERGE (dbc cell@8.5) applies one pre-deduplicated
source batch; a change-data-capture feed is the general case: many
versions of one key inside a batch, each tagged with an operation and
a sequence position, where the LAST operation per key decides the
row's fate (delete → gone, insert/update → that version's values).
This is the semantics of Delta CDF / Debezium-style feeds.

Scale shape: one hash shuffle on the keys (the ``row_number``
window), then a local filter — identical cost to ``dropDuplicates``
but deterministic; the incremental form adds one left-anti join
against the target's keys. No collects, no UDFs.

Associativity (tested, and the basis of the driver oracle): applying
a feed in two chunks — ``apply_changes_into(apply_changes(A), B)`` —
equals applying the concatenated feed once, because "latest op per
key" over a globally-ordered sequence column is order-insensitive to
chunk boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    sequence_col: str,
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("D", "DELETE"),
) -> DataFrame:
    """Final state implied by a change feed alone (empty initial
    table): for each key keep the row with the highest
    ``sequence_col`` (ties broken by every remaining column,
    descending, so the winner is total-order deterministic — the same
    guarantee :func:`streaming.sink.latest_per_key` gives), then drop
    keys whose final operation is a delete. Output columns = input
    minus ``op_col``.

    A NULL ``op_col`` on the winning row is treated as an upsert (the
    row is KEPT): ``~op.isin(deletes)`` alone would evaluate to NULL
    and silently drop the key — indistinguishable from a delete on a
    malformed feed — so the filter coalesces null-op to keep.
    """
    others = [
        c
        for c in changes.columns
        if c not in keys and c != sequence_col and c != op_col
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_col).desc_nulls_last(),
        *[F.col(c).desc_nulls_last() for c in others],
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(
            F.coalesce(
                ~F.upper(F.col(op_col)).isin([o.upper() for o in delete_ops]),
                F.lit(True),
            )
        )
        .drop("_rn", op_col)
    )


def apply_changes_into(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sequence_col: str,
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("D", "DELETE"),
) -> DataFrame:
    """Incrementally apply a change feed to an existing table state:
    rows of ``target`` whose key appears in ``changes`` are replaced
    by the feed's outcome for that key (which may be nothing, if the
    final op is a delete); untouched target rows pass through.
    ``target`` must have the columns of ``apply_changes``' output.

    Plan: resolve the feed to its net effect first (one shuffle on
    ``keys``), LEFT-ANTI the target against the feed's key set (the
    anti side is the full distinct key list of the batch — typically
    small vs the table, so AQE broadcasts it), and union. The target
    relation is scanned once and never shuffled — at 100 TB the table
    only pays a broadcast-probe scan per applied batch.
    """
    net = apply_changes(changes, keys, sequence_col, op_col, delete_ops)
    touched = changes.select(*keys).distinct()
    kept = target.join(touched, keys, "left_anti")
    return kept.unionByName(net.select(*target.columns))
