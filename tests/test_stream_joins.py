"""Stream-stream interval join (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from lakehouse_tools_spark.streaming.joins import stream_interval_join
from lakehouse_tools_spark.streaming.sink import run_to_memory
from lakehouse_tools_spark.streaming.windows import with_watermark

DDL = "event_id long, ts timestamp, user_id long"
T0 = dt.datetime(2024, 1, 1)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _rows():
    views = [(1, _mins(0), 7), (2, _mins(10), 7), (3, _mins(0), 8)]
    purchases = [(10, _mins(5), 7), (11, _mins(40), 7), (12, _mins(2), 9)]
    return views, purchases


EXPECTED = {(10, 1)}  # view@0 within [p-30m, p] for purchase@5, same user
# purchase@40: view@10 is 30min earlier — boundary INCLUDED
EXPECTED_WITH_BOUNDARY = {(10, 1), (11, 2)}


def test_static_interval_join_semantics(spark):
    views, purchases = _rows()
    v = spark.createDataFrame(views, DDL)
    p = spark.createDataFrame(purchases, DDL)
    out = stream_interval_join(
        p, v, "user_id", "ts", "ts", -1800, 0, prefixes=("p_", "v_")
    )
    got = {(r.p_event_id, r.v_event_id) for r in out.collect()}
    assert got == EXPECTED_WITH_BOUNDARY


def test_streaming_matches_batch_in_single_drain(spark, tmp_path):
    views, purchases = _rows()
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    spark.createDataFrame(views, DDL).coalesce(1).write.parquet(vdir)
    spark.createDataFrame(purchases, DDL).coalesce(1).write.parquet(pdir)
    vs = with_watermark(spark.readStream.schema(DDL).parquet(vdir), "ts", "1 hour")
    ps = with_watermark(spark.readStream.schema(DDL).parquet(pdir), "ts", "1 hour")
    out = stream_interval_join(
        ps, vs, "user_id", "ts", "ts", -1800, 0, prefixes=("p_", "v_")
    )
    assert out.isStreaming
    res = run_to_memory(out, "t_ssjoin", output_mode="append")
    got = {(r.p_event_id, r.v_event_id) for r in res.collect()}
    assert got == EXPECTED_WITH_BOUNDARY
