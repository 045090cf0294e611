"""Data-quality expectations (operators/quality.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.operators.quality import check


def _result(df_rules):
    return {(r.rule, r.column): r.n_violations for r in df_rules.collect()}


def test_row_rules_single_pass(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0, s="1-URGENT"),
            Row(k=None, v=-2.0, s="9-BOGUS"),
            Row(k=3, v=None, s=None),
        ]
    )
    out = check(
        df,
        "t",
        [
            ("not_null", "k"),
            ("in_range", "v", 0.0, 10.0),
            ("matches", "s", r"^[1-5]-"),
            ("predicate", "v_lt_k", F.col("v") < 100),
        ],
    )
    got = _result(out)
    assert got[("not_null", "k")] == 1
    assert got[("in_range", "v")] == 1       # null v is NOT a range violation
    assert got[("matches", "s")] == 1        # null s is NOT a match violation
    assert got[("predicate", "v_lt_k")] == 1  # null comparison -> violated


def test_row_rules_share_one_scan(spark, tables):
    out = check(
        tables["orders"],
        "orders",
        [
            ("not_null", "o_custkey"),
            ("in_range", "o_totalprice", 0.0, None),
            ("matches", "o_orderpriority", r"^[1-5]-"),
            ("predicate", "price_pos", F.col("o_totalprice") > 0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # 4 rules, one table pass


def test_unique_and_references(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 99)], "k long, fk long"
    )
    ref = spark.createDataFrame([(10,), (11,), (12,)], "r long")
    got = _result(
        check(df, "t", [("unique", ["k"]), ("references", "fk", ref, "r")])
    )
    assert got[("unique", "k")] == 2          # both rows of the dup key count
    assert got[("references", "fk")] == 1     # 99 is an orphan


def test_clean_table_all_zero(spark, tables):
    got = _result(
        check(
            tables["orders"],
            "orders",
            [
                ("not_null", "o_orderkey"),
                ("unique", ["o_orderkey"]),
                ("references", "o_custkey", tables["customer"], "c_custkey"),
            ],
        )
    )
    assert set(got.values()) == {0}


def test_unknown_rule_rejected(spark, tables):
    with pytest.raises(ValueError):
        check(tables["orders"], "orders", [("no_such_rule", "x")])


def test_quarantine_split_and_reasons(spark):
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.quality import quarantine

    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0, s="1-OK"),
            Row(k=2, v=-1.0, s="1-OK"),
            Row(k=3, v=5.0, s="9-BAD"),
            Row(k=4, v=-2.0, s="9-BAD"),
            Row(k=5, v=None, s=None),
        ]
    )
    rules = [("in_range", "v", 0.0, None), ("matches", "s", r"^[1-3]-")]
    good, bad = quarantine(df, rules)
    assert {r.k for r in good.collect()} == {1, 5}  # nulls pass both
    reasons = {r.k: set(r.dq_reasons) for r in bad.collect()}
    assert reasons[2] == {"in_range:v"}
    assert reasons[3] == {"matches:s"}
    assert reasons[4] == {"in_range:v", "matches:s"}
    # conservation: every row lands on exactly one side
    assert good.count() + bad.count() == df.count()


def test_quarantine_rejects_relation_rules(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.quality import quarantine

    df = spark.createDataFrame([Row(k=1)])
    with _pytest.raises(ValueError, match="row-level"):
        quarantine(df, [("unique", ["k"])])


def test_benford_known_distribution(spark):
    import math

    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.quality import benford_report

    # 100 ones, 30 twos, 10 nines; zero/null/negative/sub-1 probe the
    # digit extraction (sign and decimal point stripped, 0 excluded)
    rows = (
        [Row(x=1234.56)] * 100
        + [Row(x=-0.002911)] * 30
        + [Row(x=9.0)] * 10
        + [Row(x=0.0), Row(x=None)]
    )
    out = {r.digit: r for r in benford_report(
        spark.createDataFrame(rows), "x"
    ).collect()}
    assert set(out) == {1, 2, 9}
    assert (out[1].n, out[2].n, out[9].n) == (100, 30, 10)
    assert out[1].observed_p == math.floor(100 / 140 * 1e6) / 1e6
    assert out[1].expected_p == math.floor(math.log10(2.0) * 1e6) / 1e6
    for r in out.values():
        assert r.abs_dev == math.floor(
            abs(r.observed_p - r.expected_p) * 1e6
        ) / 1e6


def test_benford_matches_duckdb_extraction(spark, tables):
    # the string-typed digit extraction must agree with the ANSI
    # formulation the oracle uses, value for value
    import duckdb

    from lakehouse_tools_spark.operators.quality import benford_report

    got = {
        r.digit: r.n
        for r in benford_report(tables["lineitem"], "l_extendedprice").collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT CAST(substr(regexp_replace(CAST(CAST(l_extendedprice AS "
            "DECIMAL(38,6)) AS VARCHAR), '[^1-9]', '', 'g'), 1, 1) AS INT) d, "
            "count(*) FROM '/root/testdata/sf0.001/lineitem.parquet' "
            "WHERE l_extendedprice <> 0 GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_benford_excludes_nonrepresentable_values(spark):
    # NaN, +/-inf and |x| beyond decimal(38,6)'s range must be
    # EXCLUDED (try_cast -> NULL), never crash the job under ANSI
    # mode; representable rows still count and probabilities use the
    # representable total only
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.quality import benford_report

    rows = [
        Row(x=1e33),
        Row(x=-1e33),
        Row(x=float("nan")),
        Row(x=float("inf")),
        Row(x=float("-inf")),
        Row(x=1e31),   # fits: leading digit 1
        Row(x=123.4),
    ]
    out = {r.digit: r for r in benford_report(
        spark.createDataFrame(rows), "x"
    ).collect()}
    assert set(out) == {1}
    assert out[1].n == 2
    assert out[1].observed_p == 1.0


def test_benford_micro_magnitude_caveat_is_exact(spark):
    """Pin the documented scale-6 low-end behavior (ADVICE r09 /
    docstring caveat): |x| < 5e-7 renders as 0.000000 and is EXCLUDED
    like a zero; a value within half an ulp of a scale-6 boundary
    takes the ROUNDED leading digit (9.6e-7 -> 0.000001 -> digit 1)."""
    from pyspark.sql import Row

    from lakehouse_tools_spark.operators.quality import benford_report

    rows = [
        Row(x=4.9e-7),   # rounds to 0.000000 -> excluded
        Row(x=-4.9e-7),  # sign ignored, still excluded
        Row(x=9.6e-7),   # rounds to 0.000001 -> digit 1 (not 9)
        Row(x=2.4e-6),   # rounds to 0.000002 -> digit 2
        Row(x=3.0),      # ordinary value -> digit 3
    ]
    out = {r.digit: r.n for r in benford_report(
        spark.createDataFrame(rows), "x"
    ).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
