"""Spark 4 SQL-surface features: pipe syntax and VARIANT.

Both are passthrough-level features (no engine code): the tests pin
that (a) a pipe-syntax query produces exactly the rows of its
standard-SQL spelling — they parse to the same logical plan — and
(b) typed VARIANT extraction agrees with per-path string extraction,
including NULL (not error) on a missing path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_tools_spark.sql import run_sql

SF_DIR = "/root/testdata/sf0.001"

_PIPE = """
FROM orders
|> WHERE o_orderpriority <> '3-MEDIUM'
|> AGGREGATE count(*) AS n, max(o_orderkey) AS max_key
   GROUP BY o_orderstatus
|> WHERE n > 5
|> ORDER BY o_orderstatus
"""

_STANDARD = """
SELECT o_orderstatus, count(*) AS n, max(o_orderkey) AS max_key
FROM orders
WHERE o_orderpriority <> '3-MEDIUM'
GROUP BY o_orderstatus
HAVING count(*) > 5
ORDER BY o_orderstatus
"""


def test_pipe_syntax_equals_standard_sql(spark):
    pipe = run_sql(spark, _PIPE, sf_dir=SF_DIR)
    std = run_sql(spark, _STANDARD, sf_dir=SF_DIR)
    assert pipe.columns == std.columns
    assert pipe.collect() == std.collect()
    assert pipe.count() > 0


def test_variant_extraction_matches_string_path(spark, tables):
    ev = tables["events"]
    via_variant = (
        ev.select("event_type", F.parse_json("props").alias("v"))
        .select(
            "event_type",
            F.variant_get("v", "$.k", "int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )
    via_string = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )
    a = {tuple(r) for r in via_variant.collect()}
    b = {tuple(r) for r in via_string.collect()}
    assert a == b and len(a) > 0


def test_try_variant_get_missing_path_is_null(spark, tables):
    ev = tables["events"].limit(50)
    out = ev.select(
        F.try_variant_get(F.parse_json("props"), "$.missing", "string").alias(
            "m"
        )
    )
    assert out.filter(F.col("m").isNotNull()).count() == 0
