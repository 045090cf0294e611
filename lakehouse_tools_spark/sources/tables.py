"""Parquet source registry for the fixture star schema (TESTDATA.md).

The reference reads only managed Delta tables (SURVEY.md §2.2 S5);
this engine's primary source is columnar parquet (Delta's storage
format) read through Spark's vectorized reader, which gives predicate
pushdown + column pruning for free. At 100 TB the same code path
applies — ``spark.read.parquet`` over a partitioned table directory —
so nothing here is fixture-specific except the path layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar scan; Catalyst prunes/pushes."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load the fixture tables as a dict name → DataFrame."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
