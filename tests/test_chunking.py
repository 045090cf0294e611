"""Sliding-window document chunking (ext/chunking.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.ext.chunking import chunk_chars, chunk_tokens


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_chunk_chars_tiling_and_overlap(spark):
    df = _df(spark, ["abcdefghij"])  # 10 chars
    # size=4 stride=4: tiles abcd efgh ij
    got = {
        (r.chunk_id, r.chunk, r.n_chars)
        for r in chunk_chars(df, size=4, stride=4).collect()
    }
    assert got == {(0, "abcd", 4), (1, "efgh", 4), (2, "ij", 2)}
    # size=4 stride=2: overlapping windows at offsets 0,2,4,6,8
    got2 = [
        r.chunk
        for r in chunk_chars(df, size=4, stride=2).orderBy("chunk_id").collect()
    ]
    assert got2 == ["abcd", "cdef", "efgh", "ghij", "ij"]


def test_chunk_chars_empty_and_short(spark):
    df = _df(spark, ["", "ab"])
    rows = chunk_chars(df, size=4, stride=4).collect()
    assert {(r.doc_id, r.chunk_id, r.chunk) for r in rows} == {(1, 0, "ab")}


def test_chunk_chars_reconstructs_document_when_tiled(spark, tables):
    docs = tables["documents"].limit(50)
    chunks = chunk_chars(docs, size=100, stride=100)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_id")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("re"))
    )
    joined = docs.join(rebuilt, "doc_id").filter(F.col("text") != F.col("re"))
    assert joined.count() == 0


def test_chunk_tokens_windows(spark):
    df = _df(spark, ["a b c d e f g"])
    got = {
        (r.chunk_id, r.chunk, r.n_tokens)
        for r in chunk_tokens(df, size=3, stride=2).collect()
    }
    assert got == {
        (0, "a b c", 3),
        (1, "c d e", 3),
        (2, "e f g", 3),
        (3, "g", 1),
    }


def test_chunking_rejects_bad_params(spark):
    df = _df(spark, ["abc"])
    for size, stride in ((0, 1), (1, 0), (-1, 2)):
        with pytest.raises(ValueError):
            chunk_chars(df, size=size, stride=stride)
        with pytest.raises(ValueError):
            chunk_tokens(df, size=size, stride=stride)


def test_chunking_is_shuffle_free(spark, tables):
    plan = (
        chunk_chars(tables["documents"], size=256, stride=192)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
