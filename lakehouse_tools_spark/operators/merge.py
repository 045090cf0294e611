"""Key-based MERGE upsert (reference J1) as a pure DataFrame operator.

The reference's only multi-relation operator is a Delta ``MERGE INTO``
with a 3-column composite key and a residual predicate *inside the ON
clause* (``dbc cell@8.5``/``cell@8.75``, SURVEY.md §2.4):

    MERGE INTO t USING s
    ON t.k1=s.k1 AND t.k2=s.k2 AND t.k3=s.k3
       AND s.columnName NOT IN ('', 'Not partitioned')
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

Because the residual lives in ON, source rows failing it never match —
they are still INSERTed via NOT MATCHED (observed in the stored run,
``dbc results@11.0``). This module reproduces those semantics exactly
on plain DataFrames (delta-spark is not a dependency — SURVEY.md §7.5):

    result = target⟕̸source (unmatched targets, left_anti)
           ∪ target⋉source projected to source values (updates,
             one output row per matched *target* row)
           ∪ source⟕̸target (inserts, left_anti)

All three branches are equi-joins on the same key columns, so Spark
plans one broadcast (small source) or one co-partitioned shuffle that
AQE reuses across branches. Like Delta MERGE, the operator requires
the source to be unique per key under the residual predicate —
otherwise a matched target row would multiply — and raises if not.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A residual ON-clause predicate, expressed as a function of the
#: (aliased) source relation so references resolve unambiguously in
#: the self-join-shaped plans below.
SourcePredicate = Callable[[DataFrame], Column]


def _match_condition(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    source_residual: SourcePredicate | None,
) -> Column:
    cond = None
    for k in keys:
        c = target[k].eqNullSafe(source[k])
        cond = c if cond is None else (cond & c)
    if source_residual is not None:
        cond = cond & source_residual(source)
    return cond


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    source_residual: SourcePredicate | None = None,
    check_source_unique: bool = False,
) -> DataFrame:
    """Apply MERGE (UPDATE SET * / INSERT *) semantics, returning the
    merged relation. ``source_residual`` is the extra ON-clause
    predicate evaluated against ``source`` columns (J1's NOT IN).

    ``check_source_unique=True`` runs an assertion job (an agg over
    the source keys) before merging — off by default to keep the
    plan single-job at scale; enable it in tests and ad-hoc runs.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"target/source schemas differ: {target.columns} vs {source.columns}"
        )
    if check_source_unique:
        matchable = (
            source.filter(source_residual(source))
            if source_residual is not None
            else source
        )
        dup = (
            matchable.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError("MERGE source has duplicate keys under the ON predicate")

    t = target.alias("t")
    s = source.alias("s")
    cond = _match_condition(t, s, keys, source_residual)

    unmatched_targets = t.join(s, cond, "left_anti")
    # one output row per matched target row, carrying source values
    updates = t.join(s, cond, "inner").select([s[c] for c in source.columns])
    inserts = s.join(t, cond, "left_anti")

    return (
        unmatched_targets.select(source.columns)
        .unionByName(updates)
        .unionByName(inserts.select(source.columns))
    )


def not_in(column: str, values: list[str]) -> SourcePredicate:
    """The reference's ON-clause residual: ``s.columnName NOT IN (...)``
    (``dbc cell@8.5:3``). SQL NOT IN is null-rejecting; preserved."""
    return lambda source: ~source[column].isin(values)
