"""End-to-end profiler pipeline (reference 'Run All' flow, §3.1)."""

from __future__ import annotations

from lakehouse_tools_spark.operators.profile import (
    PROFILE_DATA_SCHEMA,
    SCHEMA_INFORMATION_SCHEMA,
)
from lakehouse_tools_spark.plans.pipeline import create_data_profile


def test_pipeline_schemas_match_reference_contract(spark, tables):
    sub = {k: tables[k] for k in ("region", "nation")}
    res = create_data_profile(spark, sub, "db1")
    assert res.profile_data.schema == PROFILE_DATA_SCHEMA
    assert res.schema_information.schema == SCHEMA_INFORMATION_SCHEMA


def test_pipeline_profiles_every_column(spark, tables):
    sub = {k: tables[k] for k in ("region", "nation")}
    res = create_data_profile(spark, sub, "db1")
    cols = {
        (r.tableName, r.columnName)
        for r in res.profile_data.select("tableName", "columnName").distinct().collect()
    }
    assert cols == {
        ("region", "r_regionkey"),
        ("region", "r_name"),
        ("nation", "n_nationkey"),
        ("nation", "n_name"),
        ("nation", "n_regionkey"),
    }


def test_pipeline_rerun_upsert_is_idempotent(spark, tables):
    sub = {k: tables[k] for k in ("region",)}
    first = create_data_profile(spark, sub, "db1")
    second = create_data_profile(
        spark,
        sub,
        "db1",
        existing_schema_info=first.schema_information,
        existing_profile_data=first.profile_data,
    )
    assert second.profile_data.count() == first.profile_data.count()
    assert (
        first.profile_data.exceptAll(second.profile_data).count() == 0
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-less query is an intentional rows-only check
    assert set(qs) - set(oracles) == {
        "profile_summary_approx",  # HLL estimate; summary_error_report
        "profile_quantiles",  # GK sketch; quantile_error_report
        "profile_distinct_sketch",  # sketch bytes are engine-specific
        # eigendecomposition is non-SQL-expressible; its numerical
        # contract is hash-verified via pca_error_report instead
        "sim_pca",
    }


def test_incremental_reprofile_equals_full_recompute(spark, tables):
    from pyspark.sql import functions as F

    from lakehouse_tools_spark.operators.profile import profile_data
    from lakehouse_tools_spark.plans.pipeline import incremental_reprofile

    base_tables = {k: tables[k] for k in ("region", "nation", "orders")}
    base = profile_data(base_tables, "db1")
    # orders changes: drop URGENT rows entirely (value rows must vanish)
    new_orders = tables["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    incr = incremental_reprofile(spark, {"orders": new_orders}, "db1", base)
    full = profile_data({**base_tables, "orders": new_orders}, "db1")
    assert incr.count() == full.count()
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0
    # the stale '1-URGENT' histogram row is gone
    assert incr.filter(
        (F.col("tableName") == "orders") & (F.col("value") == "1-URGENT")
    ).count() == 0
