"""Data-quality expectations: declarative rules → violation counts.

The guardrail layer a lakehouse pipeline runs before publishing a
table (Delta constraints / dbt tests / Great Expectations shape):
declare rules, get back one row per rule with its violation count —
empty-violations ⇒ publishable.

Execution shape: all single-table rules (not_null / in_range /
matches / unique / custom predicate) evaluate in ONE aggregate pass —
each rule is a ``sum(CASE WHEN violated)`` branch, map-side combined,
so 20 rules cost the same scan as one. ``unique`` needs its own
groupBy (a distinct count per key set); ``references`` (foreign key)
is a broadcast-friendly left-anti join per rule. Nothing collects raw
rows — violation SAMPLES are a debugging concern for a driver query
with a LIMIT, not something to ship to the driver by default.

Rules are plain tuples, so the rule set is data (storable next to the
table it guards)::

    check(df, "orders", [
        ("not_null", "o_custkey"),
        ("in_range", "o_totalprice", 0, None),
        ("matches", "o_orderpriority", r"^[1-5]-"),
        ("unique", ["o_orderkey"]),
        ("references", "o_custkey", customers_df, "c_custkey"),
    ])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_tools_spark.functions.portable import floor6

CHECK_SCHEMA = T.StructType(
    [
        T.StructField("tableName", T.StringType()),
        T.StructField("rule", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("n_violations", T.LongType()),
    ]
)


def _violation(rule: tuple) -> tuple[str, str, Column]:
    """(rule name, column label, per-row violated? predicate)."""
    kind = rule[0]
    if kind == "not_null":
        _, col = rule
        return kind, col, F.col(col).isNull()
    if kind == "in_range":
        _, col, lo, hi = rule
        c = F.col(col)
        v = F.lit(False)
        if lo is not None:
            v = v | (c < F.lit(lo))
        if hi is not None:
            v = v | (c > F.lit(hi))
        # nulls are not range violations — that's not_null's job
        return kind, col, F.when(c.isNotNull(), v).otherwise(F.lit(False))
    if kind == "matches":
        _, col, pattern = rule
        c = F.col(col)
        return (
            kind,
            col,
            F.when(c.isNotNull(), ~c.rlike(pattern)).otherwise(F.lit(False)),
        )
    if kind == "predicate":
        _, label, cond = rule
        # constraint semantics: a row VIOLATES unless the predicate is
        # definitely true (null-valued conditions count as violations)
        return kind, label, ~F.coalesce(cond, F.lit(False))
    raise ValueError(f"unknown rule kind: {kind!r}")


def check(
    df: DataFrame,
    table: str,
    rules: list[tuple],
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → one row per rule:
    ``(tableName, rule, column, n_violations)``. See module docstring
    for the rule grammar and the execution shape."""
    row_rules = [r for r in rules if r[0] in ("not_null", "in_range", "matches", "predicate")]
    unique_rules = [r for r in rules if r[0] == "unique"]
    ref_rules = [r for r in rules if r[0] == "references"]
    if len(row_rules) + len(unique_rules) + len(ref_rules) != len(rules):
        bad = [r[0] for r in rules if r[0] not in
               ("not_null", "in_range", "matches", "predicate", "unique", "references")]
        raise ValueError(f"unknown rule kinds: {bad}")

    spark = df.sparkSession
    parts: list[DataFrame] = []

    if row_rules:
        branches = [_violation(r) for r in row_rules]
        agg = df.agg(
            *[
                F.sum(F.when(v, 1).otherwise(0)).alias(f"_v_{i}")
                for i, (_, _, v) in enumerate(branches)
            ]
        )
        stack_args: list[Column] = []
        for i, (kind, col, _) in enumerate(branches):
            stack_args.extend(
                [F.lit(kind), F.lit(col), F.coalesce(F.col(f"_v_{i}"), F.lit(0))]
            )
        parts.append(
            agg.select(
                F.stack(F.lit(len(branches)), *stack_args).alias(
                    "rule", "column", "n_violations"
                )
            )
        )

    for r in unique_rules:
        _, cols = r
        cols = [cols] if isinstance(cols, str) else list(cols)
        dup = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations"))
            .select(
                F.lit("unique").alias("rule"),
                F.lit(",".join(cols)).alias("column"),
                F.col("n_violations"),
            )
        )
        parts.append(dup)

    for r in ref_rules:
        _, col, ref_df, ref_col = r
        orphans = (
            df.select(F.col(col)).filter(F.col(col).isNotNull())
            .join(
                ref_df.select(F.col(ref_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit("references").alias("rule"),
                F.lit(col).alias("column"),
                F.col("n_violations"),
            )
        )
        parts.append(orphans)

    if not parts:
        return spark.createDataFrame([], CHECK_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.lit(table).alias("tableName"),
        "rule",
        "column",
        F.col("n_violations").cast("long").alias("n_violations"),
    )


def quarantine(
    df: DataFrame, rules: list[tuple]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (passing, quarantined) — the dead-letter
    pattern: publish the clean rows, route violators with their
    failure reasons to a quarantine table for repair instead of
    failing the whole batch.

    Same per-row predicates :func:`check` counts, evaluated in ONE
    projection: each row gets an array of ``rule:column`` labels for
    the rules it violates; empty array ⇒ passing. Both returned
    relations derive from that single projection (two filters over
    one plan — Catalyst reuses the scan), nothing collects. Only
    row-level rules apply; relation-level rules (``unique`` /
    ``references``) can't blame an individual row and are rejected.
    """
    bad_kinds = [r[0] for r in rules if r[0] in ("unique", "references")]
    if bad_kinds:
        raise ValueError(
            f"quarantine takes row-level rules only, got: {bad_kinds}"
        )
    branches = [_violation(r) for r in rules]
    reasons = F.array_compact(
        F.array(
            *[
                F.when(v, F.lit(f"{kind}:{col}"))
                for kind, col, v in branches
            ]
        )
    )
    flagged = df.withColumn("_dq_reasons", reasons)
    good = flagged.filter(F.size("_dq_reasons") == 0).drop("_dq_reasons")
    bad = flagged.filter(F.size("_dq_reasons") > 0).withColumnRenamed(
        "_dq_reasons", "dq_reasons"
    )
    return good, bad


def benford_report(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of ``col`` vs Benford's
    law — the classic forensic screen for fabricated or truncated
    numeric data (naturally-grown magnitudes follow ``P(d) =
    log10(1 + 1/d)``; synthetic, capped, or copy-pasted columns
    don't).

    Output: one row per digit 1–9 — ``digit, n, observed_p,
    expected_p, abs_dev`` (probabilities floor-truncated to 6
    decimals; see ``functions.portable.floor6`` for why not round).
    Zero/NULL values carry no leading digit and are excluded; signs
    and decimal points are ignored.

    Digit extraction is deliberately string-typed for cross-engine
    determinism: the value is cast to ``decimal(38,6)`` (exact
    round-to-nearest, no scientific notation in any engine), rendered
    as text, every non-1-9 character stripped, first char kept. The
    arithmetic alternative — ``floor(x / 10^floor(log10(x)))`` —
    depends on the platform libm's last-ulp behaviour at powers of
    ten; this one doesn't. The cast is a ``try_cast``: NaN, ±inf and
    |x| beyond decimal(38,6)'s range (~1e32) go NULL and are
    EXCLUDED from the distribution rather than failing the job under
    ANSI mode — at real scale, count those separately with a
    not_null/in_range rule. The fixed scale-6 also bounds the LOW
    end: values with ``|x| < 5e-7`` render as ``0.000000`` (no
    nonzero digit survives) and are excluded like zeros, and a value
    within half an ulp of a scale-6 boundary takes the ROUNDED
    leading digit (e.g. ``9.6e-7`` → ``0.000001`` → digit 1, not 9).
    Columns living at micro magnitudes should be pre-scaled (Benford
    is scale-invariant in aggregate, so multiply by a power of ten
    first) — raising the decimal scale instead would reopen the
    scientific-notation rendering divergence this cast exists to
    close. ANSI equivalent:
    ``substr(regexp_replace(cast(try_cast(x as decimal(38,6)) as
    varchar), '[^1-9]', '', 'g'), 1, 1)`` (engines whose try_cast
    still rejects NaN/inf need an explicit isnan/isinf guard — the
    DuckDB oracle carries one).

    Execution shape: one projection + one 9-group aggregate; the
    grand total joins back as a broadcast scalar. Shuffle carries at
    most 9 rows per map partition (map-side combine), independent of
    input volume — safe at any scale.
    """
    digit_s = F.substring(
        F.regexp_replace(
            F.col(col).try_cast("decimal(38,6)").cast("string"),
            "[^1-9]",
            "",
        ),
        1,
        1,
    )
    counts = (
        df.select(digit_s.alias("_d"))
        .filter(F.length("_d") > 0)
        .select(F.col("_d").cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_total"))
    observed = F.col("n").cast("double") / F.col("_total").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            floor6(observed).alias("observed_p"),
            floor6(expected).alias("expected_p"),
        )
        .select(
            "digit",
            "n",
            "observed_p",
            "expected_p",
            floor6(
                F.abs(F.col("observed_p") - F.col("expected_p"))
            ).alias("abs_dev"),
        )
    )
