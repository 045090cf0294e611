"""foreachBatch streaming sink → durable keyed upsert (streaming/sink.py)."""

from __future__ import annotations

from pyspark.sql import Row

from lakehouse_tools_spark.operators.writer import create_or_replace
from lakehouse_tools_spark.streaming.sink import upsert_stream

DDL = "k string, v long"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(path)


def _state(spark, tbl):
    return {(r.k, r.v) for r in spark.table(tbl).collect()}


def test_upsert_stream_inserts_and_updates(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tbl = "t_stream_upsert"
    create_or_replace(spark, spark.createDataFrame([Row(k="a", v=1)], DDL), tbl)

    # drain 1: b inserted, a updated
    _write_batch(spark, src, [("a", 10), ("b", 20)])
    stream = spark.readStream.schema(DDL).parquet(src)
    q = upsert_stream(stream, tbl, ["k"], ckpt)
    q.awaitTermination(120)
    assert _state(spark, tbl) == {("a", 10), ("b", 20)}

    # drain 2 resumes from the checkpoint: only the new file is read,
    # c inserted, b updated, a untouched
    _write_batch(spark, src, [("b", 21), ("c", 30)])
    q = upsert_stream(spark.readStream.schema(DDL).parquet(src), tbl, ["k"], ckpt)
    q.awaitTermination(120)
    assert _state(spark, tbl) == {("a", 10), ("b", 21), ("c", 30)}

    # drain 3 with nothing new: no-op, state unchanged (idempotence)
    q = upsert_stream(spark.readStream.schema(DDL).parquet(src), tbl, ["k"], ckpt)
    q.awaitTermination(120)
    assert _state(spark, tbl) == {("a", 10), ("b", 21), ("c", 30)}
