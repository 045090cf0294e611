"""Vector math + int8 quantization (functions/vectors.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quantize_int8_roundtrip_error_bound(spark, tables):
    from lakehouse_tools_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )

    emb = tables["embeddings"].limit(100)
    vd = F.col("embedding").cast("array<double>")
    qs = quantize_int8(vd)
    out = emb.select(
        qs.getField("scale").alias("scale"),
        F.array_max(
            F.zip_with(
                vd, dequantize_int8(qs), lambda x, y: F.abs(x - y)
            )
        ).alias("err"),
        F.array_max(
            F.transform(qs.getField("q"), lambda x: F.abs(x))
        ).alias("qmax"),
    ).collect()
    for r in out:
        assert r.err <= r.scale * 0.5000001
        assert r.qmax <= 127


def test_quantize_int8_zero_vector(spark):
    from lakehouse_tools_spark.functions.vectors import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], ["v"])
    qs = quantize_int8(F.col("v"))
    [r] = df.select(
        qs.getField("scale").alias("s"),
        dequantize_int8(qs).alias("dq"),
    ).collect()
    assert r.s == 0.0 and r.dq == [0.0, 0.0, 0.0]
