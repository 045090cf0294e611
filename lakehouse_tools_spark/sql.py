"""Raw-SQL entry point (reference entry point 2, SURVEY.md §3.2).

The reference hands every SQL string to Spark verbatim — it has no
parser of its own. This module keeps that contract: register the
engine's tables as views, pass the text to ``spark.sql``. No string
splicing happens here (identifiers are caller-provided SQL, not
interpolated data — the reference's F6 weakness is not reproduced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_tools_spark.sources.tables import register_views


def run_sql(
    spark: SparkSession,
    sql: str,
    sf_dir: str | None = None,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute ``sql`` against the engine's registered tables.

    ``sf_dir`` registers the fixture tables as views first;
    ``tables`` registers caller-supplied DataFrames by name.
    """
    if sf_dir is not None:
        register_views(spark, sf_dir)
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
