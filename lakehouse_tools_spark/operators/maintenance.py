"""Table maintenance: compaction + Z-order-style clustering (reference O1).

The reference finishes its pipeline with Delta ``OPTIMIZE … ZORDER BY``
(``dbc cell@9.0``/``cell@10.0``) — small-file compaction plus
multi-dimensional clustering so min/max data skipping prunes files for
predicates on the Z columns. Without delta-spark (SURVEY.md §7.5) the
same physical layout is achieved at write time:

- ``compact(df, target_file_rows)``: AQE-style small-file control via
  an explicit repartition before write.
- ``zorder_layout(df, cols)``: ``repartitionByRange(cols)`` +
  ``sortWithinPartitions(cols)`` — lexicographic multi-column
  clustering. Parquet then stores per-file/rowgroup min-max on the
  leading columns, giving the same skip-pruning effect for range and
  equality predicates on prefixes of ``cols``. A true Z-curve
  (bit-interleaved) option is provided for workloads that filter on
  *non-prefix* dimensions, built from plain integer expressions so it
  stays inside whole-stage codegen.

Row-set preservation is the operator's contract: layout changes only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact(df: DataFrame, num_files: int) -> DataFrame:
    """Coalesce a relation to ``num_files`` output files' worth of
    partitions (write-time small-file compaction, the OSS analog of
    the reference's Delta optimizeWrite conf, ``dbc cell@1.5:1``)."""
    return df.repartition(num_files)


def zorder_layout(df: DataFrame, cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort layout rewrite (lexicographic clustering).

    Equivalent data-skipping behavior to OPTIMIZE ZORDER for prefix
    predicates; row set is unchanged (property-tested).
    """
    ncols = [F.col(c) for c in cols]
    if num_partitions:
        out = df.repartitionByRange(num_partitions, *ncols)
    else:
        out = df.repartitionByRange(*ncols)
    return out.sortWithinPartitions(*ncols)


def _interleave_bits(cols: list[Column], bits: int) -> Column:
    """Bit-interleave normalized integer columns into one Z-value.

    Pure integer Catalyst expressions (shifts/masks/ors) — no UDF, so
    the whole computation stays in codegen.
    """
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_curve_layout(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """True Z-curve clustering: rank-normalize each dimension to a
    ``bits``-wide integer via ``percent_rank``-free bucketing
    (``ntile`` over a sort would shuffle twice; instead hash-free
    min/max scaling is computed per column in one aggregate), then
    sort by the interleaved Z-value.

    Used when queries filter on non-prefix dimensions; for the
    reference's workload (filters on databaseName/tableName prefixes)
    ``zorder_layout`` is the right default.
    """
    stats = df.agg(
        *[F.min(F.hash(c)).alias(f"_min_{c}") for c in cols],
        *[F.max(F.hash(c)).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    scaled = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = max(hi - lo, 1)
        scaled.append(
            ((F.hash(c).cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1) / F.lit(span))
            .cast("long")
        )
    z = _interleave_bits(scaled, bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
