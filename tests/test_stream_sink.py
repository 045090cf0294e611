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


def test_latest_per_key_is_deterministic_and_newest_wins(spark):
    from lakehouse_tools_spark.streaming.sink import latest_per_key

    rows = [("a", i, 100 - i) for i in range(50)] + [("b", 7, 7)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    # newest by ts wins regardless of physical row order
    for nparts in (1, 7, 32):
        got = {
            (r.k, r.ts, r.v)
            for r in latest_per_key(df.repartition(nparts), ["k"], ["ts"]).collect()
        }
        assert got == {("a", 49, 51), ("b", 7, 7)}
    # without order_by: still deterministic (canonical tiebreak order)
    a = sorted(map(tuple, latest_per_key(df.repartition(3), ["k"]).collect()))
    b = sorted(map(tuple, latest_per_key(df.repartition(17), ["k"]).collect()))
    assert a == b


def test_upsert_stream_dedups_within_batch_newest_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tbl = "t_stream_upsert_dedup"
    ddl = "k string, ts long, v long"
    create_or_replace(spark, spark.createDataFrame([], ddl), tbl)
    # one micro-batch with 3 versions of key a: ts=3 must win
    spark.createDataFrame(
        [("a", 1, 10), ("a", 3, 30), ("a", 2, 20)], ddl
    ).coalesce(1).write.mode("append").parquet(src)
    q = upsert_stream(
        spark.readStream.schema(ddl).parquet(src), tbl, ["k"], ckpt, order_by=["ts"]
    )
    q.awaitTermination(120)
    assert {(r.k, r.ts, r.v) for r in spark.table(tbl).collect()} == {("a", 3, 30)}


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


def test_sized_state_partitions_tracks_source_bytes(spark, tmp_path, monkeypatch):
    from lakehouse_tools_spark.streaming.sink import (
        _STATE_PARTITION_FLOOR,
        sized_state_partitions,
    )

    # tiny source: floor, not the core count
    p = tmp_path / "tiny.parquet"
    p.write_bytes(b"x" * 1024)
    assert sized_state_partitions(spark, str(p)) == _STATE_PARTITION_FLOOR
    # directory sources sum their files; growth is monotone in bytes
    d = tmp_path / "dir"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.parquet").write_bytes(b"x" * (200 << 20))
    grown = sized_state_partitions(spark, str(d))
    assert grown > _STATE_PARTITION_FLOOR
    # unknown path: falls back to the session default, never raises
    fallback = sized_state_partitions(spark, str(tmp_path / "missing"))
    assert fallback == int(spark.conf.get("spark.sql.shuffle.partitions"))
    # env override wins
    monkeypatch.setenv("LTS_STREAM_STATE_PARTITIONS", "13")
    assert sized_state_partitions(spark, str(p)) == 13


def test_scoped_shuffle_partitions_restores(spark):
    from lakehouse_tools_spark.streaming.sink import scoped_shuffle_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_shuffle_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # exception path restores too
    try:
        with scoped_shuffle_partitions(spark, 5):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # None is a no-op scope
    with scoped_shuffle_partitions(spark, None):
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
