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


def test_left_outer_sentinel_flush_matches_batch_left_join(spark, tmp_path):
    from pyspark.sql import functions as F

    from lakehouse_tools_spark.streaming.joins import flush_sentinel_union

    views, purchases = _rows()
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    spark.createDataFrame(views, DDL).coalesce(1).write.parquet(vdir)
    spark.createDataFrame(purchases, DDL).coalesce(1).write.parquet(pdir)
    flush = dt.datetime(2030, 1, 1)

    def side(path, sid, sdir):
        base = spark.readStream.schema(DDL).parquet(path)
        withsent = flush_sentinel_union(
            base, {"event_id": sid, "ts": flush, "user_id": sid}, sdir
        )
        return with_watermark(withsent, "ts", "1 hour")

    ps = side(pdir, -1, str(tmp_path / "sp"))
    vs = side(vdir, -2, str(tmp_path / "sv"))
    out = stream_interval_join(
        ps, vs, "user_id", "ts", "ts", -1800, 0,
        prefixes=("p_", "v_"), how="left_outer",
    )
    res = run_to_memory(out, "t_ssjoin_outer", output_mode="append").filter(
        F.col("user_id") >= 0
    )
    got = {(r.p_event_id, r.v_event_id) for r in res.collect()}
    # every unmatched purchase emits a null row — exact batch LEFT JOIN
    assert got == EXPECTED_WITH_BOUNDARY | {(12, None)}


def test_left_outer_without_sentinel_holds_back_young_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    views, purchases = _rows()
    vdir, pdir = str(tmp_path / "v2"), str(tmp_path / "p2")
    spark.createDataFrame(views, DDL).coalesce(1).write.parquet(vdir)
    spark.createDataFrame(purchases, DDL).coalesce(1).write.parquet(pdir)
    vs = with_watermark(
        spark.readStream.schema(DDL).parquet(vdir), "ts", "1 hour"
    )
    ps = with_watermark(
        spark.readStream.schema(DDL).parquet(pdir), "ts", "1 hour"
    )
    out = stream_interval_join(
        ps, vs, "user_id", "ts", "ts", -1800, 0,
        prefixes=("p_", "v_"), how="left_outer",
    )
    res = run_to_memory(out, "t_ssjoin_outer_nosent", output_mode="append")
    nulls = {
        r.p_event_id for r in res.filter(F.col("v_event_id").isNull()).collect()
    }
    # all rows are within the watermark horizon of max(ts): nothing
    # is provably closed, so no null row may be emitted
    assert nulls == set()


def test_flush_sentinel_union_validates_columns(spark, tmp_path):
    import pytest

    from lakehouse_tools_spark.streaming.joins import flush_sentinel_union

    base = spark.readStream.schema(DDL).parquet(str(tmp_path))
    with pytest.raises(ValueError):
        flush_sentinel_union(base, {"event_id": 1}, str(tmp_path / "s"))


def test_interval_join_rejects_unknown_how(spark):
    import pytest

    views, purchases = _rows()
    v = spark.createDataFrame(views, DDL)
    p = spark.createDataFrame(purchases, DDL)
    with pytest.raises(ValueError):
        stream_interval_join(
            p, v, "user_id", "ts", "ts", -1800, 0, how="right_outer"
        )


def test_run_to_memory_release_terminated_opt_out(spark, tmp_path):
    # ADVICE r06: resetTerminated() is session-global; callers that
    # coordinate via awaitAnyTermination() can now opt out. The
    # opt-out path must still drain to a readable table.
    views, purchases = _rows()
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    spark.createDataFrame(views, DDL).coalesce(1).write.parquet(vdir)
    spark.createDataFrame(purchases, DDL).coalesce(1).write.parquet(pdir)
    vs = with_watermark(spark.readStream.schema(DDL).parquet(vdir), "ts", "1 hour")
    ps = with_watermark(spark.readStream.schema(DDL).parquet(pdir), "ts", "1 hour")
    out = stream_interval_join(
        ps, vs, "user_id", "ts", "ts", -1800, 0, prefixes=("p_", "v_")
    )
    res = run_to_memory(
        out, "t_ssjoin_noreset", output_mode="append", release_terminated=False
    )
    got = {(r.p_event_id, r.v_event_id) for r in res.collect()}
    assert got == EXPECTED_WITH_BOUNDARY
    # leave the session clean for later streaming tests
    spark.streams.resetTerminated()
