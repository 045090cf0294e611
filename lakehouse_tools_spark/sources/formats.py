"""Row-format sources/sinks: CSV and JSON(lines).

The reference touches only Delta (SURVEY.md §2.2 S5); a usable engine
also needs the interchange formats. Two rules keep these scalable:

- **Always pass an explicit schema on read.** Schema inference is a
  full extra pass over the data (or a sampled lie); at 100 TB it is
  the difference between one scan and two. ``read_csv``/``read_json``
  therefore take a required ``StructType`` — callers that genuinely
  want inference opt in with ``infer=True`` on a sample.
- **Writes shape downstream parallelism.** The writers expose
  ``partition_by`` (directory-partitioned layout → partition pruning
  for whoever reads it next) and pass the incoming DataFrame's
  partitioning through untouched — no hidden coalesce(1).

CSV/JSON scans still get *predicate* evaluation pushed into the scan
node but not columnar pruning (row formats must parse whole lines);
they are ingestion formats here, parquet remains the compute format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Write/read timestamps in a zone-less canonical form. The session is
#: pinned to UTC, so this round-trips parquet-born TIMESTAMP values
#: bit-exactly through text.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_COMMON = {"timestampFormat": _TS_FMT}


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    header: bool = True,
) -> None:
    w = df.write.mode("overwrite").options(header=str(header).lower(), **_COMMON)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError(
            "read_csv requires an explicit schema (or infer=True): "
            "inference is a second full scan of the input"
        )
    r = spark.read.options(header=str(header).lower(), **_COMMON)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def write_json(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    w = df.write.mode("overwrite").options(**_COMMON)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError(
            "read_json requires an explicit schema (or infer=True): "
            "inference is a second full scan of the input"
        )
    r = spark.read.options(**_COMMON)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """ORC sink — the other columnar interchange format (Hive-lineage
    warehouses). Columnar + typed, so unlike the text formats it keeps
    predicate pushdown AND column pruning on read."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Self-describing columnar format: the file carries its
    schema, no inference pass needed."""
    return spark.read.orc(path)


def export_binary(
    df: DataFrame,
    id_col: str,
    content_col: str,
    path: str,
    suffix: str = ".bin",
) -> DataFrame:
    """Materialize a binary column as one file per row (``<id><suffix>``
    under ``path``) — the export half of a multimodal pipeline
    (shipping decoded images/audio to a model's file-based loader).
    Distributed: each task writes its own partition's rows directly
    (``mapInPandas`` manifest — no driver collect, no coalesce(1));
    returns the written manifest ``(<id_col>, file_name, n_bytes)``.
    The write happens on manifest materialization (action-on-consume,
    like every Spark sink). String content is encoded UTF-8.

    Local-filesystem path semantics: on a real cluster, point ``path``
    at shared storage (object store via a mounted/fuse layer) — each
    executor writes its shard independently, which is exactly the
    fan-out an object store wants.
    """
    import os

    import pandas as pd

    dt = dict(df.dtypes)[id_col]
    sel = df.select(id_col, content_col)

    def _write(batches):
        os.makedirs(path, exist_ok=True)
        for b in batches:
            names, sizes = [], []
            for i, content in zip(b[id_col], b[content_col]):
                data = (
                    content.encode("utf-8")
                    if isinstance(content, str)
                    else bytes(content)
                )
                name = f"{i}{suffix}"
                with open(os.path.join(path, name), "wb") as fh:
                    fh.write(data)
                names.append(name)
                sizes.append(len(data))
            yield pd.DataFrame(
                {id_col: b[id_col], "file_name": names, "n_bytes": sizes}
            )

    return sel.mapInPandas(_write, f"{id_col} {dt}, file_name string, n_bytes long")


def read_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Scan a directory of opaque files with Spark's ``binaryFile``
    source: ``(path, modificationTime, length, content)``, one row per
    file, read in parallel. The ingestion half of the multimodal
    pipeline (ext/multimodal.py decodes ``content`` downstream)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout (``path/col=value/...``) — the
    directory structure that makes partition pruning possible: a read
    with a filter on a partition column never opens the other
    partitions' files. At 100 TB, partitioning by the dominant filter
    column (date, tenant, language) is the difference between a
    full-corpus scan and a directory listing; the pruning itself is
    pinned in tests/test_plans.py."""
    (
        df.write.format(fmt)
        .mode("overwrite")
        .partitionBy(*partition_by)
        .save(path)
    )


def read_partitioned(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a partitioned layout back; partition columns come from
    the directory names (partition discovery), so filters on them
    prune at planning time — no footer of a pruned file is touched."""
    return spark.read.format(fmt).load(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files carry DIFFERENT schemas
    (a table that gained columns over time) with schema merging: the
    result schema is the union of all file schemas, and rows from
    files lacking a column read as null — the read-side half of
    schema evolution (``merge.upsert(evolve_schema=True)`` is the
    write side).

    ``mergeSchema`` costs one footer read per file at planning time
    (not a data scan); Spark leaves it off by default for exactly
    that planning cost, so this entry point makes the trade explicit
    rather than flipping a global conf.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def roundtrip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    """Write ``df`` to ``path`` as ``fmt`` and read it back with the
    source DataFrame's own schema — the self-check used by the
    correctness harness (formats must neither drop rows nor perturb
    values)."""
    spark = df.sparkSession
    if fmt == "csv":
        write_csv(df, path)
        return read_csv(spark, path, schema=df.schema)
    if fmt == "json":
        write_json(df, path)
        return read_json(spark, path, schema=df.schema)
    if fmt == "orc":
        write_orc(df, path)
        return read_orc(spark, path)
    raise ValueError(f"unsupported format: {fmt!r}")
