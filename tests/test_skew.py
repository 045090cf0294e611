"""Skew mitigation: salted joins / two-phase aggregation must be
result-identical to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.functions.skew import salted_agg, salted_join


def skewed_df(spark):
    # 90% of rows share one hot key
    rows = [Row(k="hot", v=i) for i in range(90)] + [
        Row(k=f"k{i}", v=i) for i in range(10)
    ]
    return spark.createDataFrame(rows)


def test_salted_join_matches_plain_join(spark):
    left = skewed_df(spark)
    right = spark.createDataFrame(
        [Row(k="hot", name="H"), Row(k="k3", name="A"), Row(k="zz", name="Z")]
    )
    plain = sorted(map(tuple, left.join(right, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(left, right, ["k"], buckets=8).collect()))
    assert salted == plain
    assert len(plain) == 91  # 90 hot + k3


def test_salted_join_spreads_hot_key(spark):
    left = skewed_df(spark)
    salted = left.withColumn(
        "_salt",
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws("\x1f", "v")), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(8),
        ),
    )
    n_salts = (
        salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts >= 6  # hot key fans out over most buckets


def test_salted_agg_matches_plain_agg(spark):
    df = skewed_df(spark)
    plain = {
        (r.k, r.n, r.sum_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        (r.k, r.n, r.sum_v)
        for r in salted_agg(df, ["k"], sum_cols=["v"], buckets=8).collect()
    }
    assert salted == plain
