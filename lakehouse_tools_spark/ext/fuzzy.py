"""Fuzzy (edit-distance) string joins via deletion-neighborhood blocking.

Entity resolution — matching names/titles/addresses across tables —
needs "join where edit_distance(a, b) ≤ k". The naive plan is a
cartesian product with a Levenshtein residual: O(n·m) distance
evaluations, a non-starter at scale. This module blocks with
DELETION NEIGHBORHOODS (the SymSpell-family scheme): if
``ed(a, b) ≤ k`` then deleting each side's ≤ k edited positions
yields a common string, so the ≤k-deletion neighborhoods of a and b
intersect — an equi-join on the variant string is therefore a
complete (recall-1.0) candidate generator. For the common
``k == 1`` case the join is POSITIONAL — equal-length pairs join on
``(len, deleted_pos, variant)``, whose buckets are bounded by the
alphabet size — so low-entropy key families (zero-padded IDs,
shared-prefix name sequences) stay linear where q-gram blocking
degenerates to ~n² gram collisions (the measured r12 finding that
motivated this design; SCALING.md "fuzzy_join").

Blocking and the exact residual run on DISTINCT strings; row
multiplicity re-enters only in the final key-expansion joins, so
the plan pays output cardinality — never repeated blocking work —
on columns full of duplicate strings. Recall is pinned against the
brute-force form in tests and against DuckDB's cross-join +
``levenshtein`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_deletions(s):  # Column -> array<string> of one-char deletions
    return F.when(
        F.length(s) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _positional_deletions(d: DataFrame, s_col: str) -> DataFrame:
    """``(s, _ln, _pos, _v)``: every one-char-deletion variant of the
    distinct-string relation, tagged with the deleted position."""
    s = F.col(s_col)
    return d.select(
        s_col,
        F.length(s).alias("_ln"),
        F.explode(
            F.when(
                F.length(s) > 0, F.sequence(F.lit(1), F.length(s))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_pos"),
    ).select(
        s_col,
        "_ln",
        "_pos",
        F.concat(
            s.substr(F.lit(1), F.col("_pos") - 1),
            s.substr(F.col("_pos") + 1, F.length(s)),
        ).alias("_v"),
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    q: int = 3,
) -> DataFrame:
    """All pairs with ``levenshtein(left_col, right_col) ≤
    max_distance``. Output: ``(left_key, right_key, distance)``.

    Plan shape (r12 redesign, replacing q-gram blocking):

    1. **Dedup first.** Blocking and the exact residual run on the
       DISTINCT string relations. Row multiplicity re-enters only in
       the final key-expansion joins, so duplicated strings — the
       normal shape of entity columns — cost exactly the output
       cardinality, never repeated blocking work. (The r12 sweep
       caught the old per-row form grinding at sf10, where each of
       1 000 distinct supplier names recurs 100×.)
    2. **Deletion-neighborhood (SymSpell-family) blocking** — exact:
       ``ed(a, b) ≤ k`` implies some alignment edits ≤ k positions,
       and deleting each side's edited positions yields a COMMON
       string reachable by ≤ k single-char deletions from either
       side, so the ≤k-deletion neighborhoods intersect. For
       ``max_distance == 1`` the join is POSITIONAL, which is what
       makes low-entropy key families (zero-padded IDs, shared-
       prefix names — exactly where q-gram blocking degenerates to
       ~n² gram collisions: measured 11.3e9 (pair, gram) rows on
       sf10 supplier names, vs 8.8e8 for plain variant equality and
       ~alphabet-bounded buckets here) scale linearly:

       - equal-length pairs at distance 1 differ in exactly one
         position p, so deleting p from BOTH yields equal variants:
         join on ``(len, pos, variant)``. Strings colliding in one
         bucket differ only at ``pos`` — bucket size ≤ alphabet.
       - length-diff-1 pairs: the shorter string IS a one-deletion
         variant of the longer: join the short side's string against
         the long side's positional variants. Bucket size ≤ the
         insert-neighborhood of the key, ≤ alphabet × (len + 1).
       - distance-0 pairs: plain string equality.

       For ``max_distance ≥ 2`` the join falls back to plain
       ≤k-deletion-neighborhood intersection (variants accumulated
       by k rounds of one-char deletion, joined on the variant
       string) — exact by the same containment argument, with the
       positional refinement left on the table.
    3. **Exact residual on distinct pairs**, then expansion joins
       back to both key relations.

    ``q`` is retained for API compatibility with the pre-r12 q-gram
    form; the deletion-neighborhood plan does not use it.
    """
    k = int(max_distance)
    l = left.select(F.col(left_key).alias("_lk"), F.col(left_col).alias("_ls"))
    r = right.select(
        F.col(right_key).alias("_rk"), F.col(right_col).alias("_rs")
    )
    ld = l.select("_ls").distinct()
    rd = r.select("_rs").distinct()
    eq = ld.join(rd, ld["_ls"] == rd["_rs"]).select("_ls", "_rs")
    if k == 1:
        lp = _positional_deletions(ld, "_ls")
        rp = _positional_deletions(rd, "_rs")
        eqlen = (
            lp.join(rp, ["_ln", "_pos", "_v"])
            .select("_ls", "_rs")
        )
        short_l = ld.join(rp, ld["_ls"] == rp["_v"]).select("_ls", "_rs")
        short_r = rd.join(lp, rd["_rs"] == lp["_v"]).select("_ls", "_rs")
        cand = eq.unionByName(eqlen).unionByName(short_l).unionByName(
            short_r
        ).distinct()
    else:
        def _nbhd(d: DataFrame, s_col: str) -> DataFrame:
            arr = F.array(F.col(s_col))
            for _ in range(k):
                arr = F.array_distinct(
                    F.concat(
                        arr, F.flatten(F.transform(arr, _one_deletions))
                    )
                )
            return d.select(s_col, F.explode(arr).alias("_v"))

        cand = (
            _nbhd(ld, "_ls")
            .join(_nbhd(rd, "_rs"), "_v")
            .select("_ls", "_rs")
            .distinct()
            .unionByName(eq)
            .distinct()
        )
    pairs = cand.withColumn(
        "distance", F.levenshtein(F.col("_ls"), F.col("_rs"))
    ).filter(F.col("distance") <= k)
    return (
        pairs.join(l, "_ls")
        .join(r, "_rs")
        .select(
            F.col("_lk").alias(left_key),
            F.col("_rk").alias(right_key),
            "distance",
        )
    )


def edit_distance_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """The O(n·m) reference form (cross join + residual) — the recall
    baseline the blocked join is tested against. Never the scale
    path."""
    l = left.select(F.col(left_key).alias("_lk"), F.col(left_col).alias("_ls"))
    r = right.select(F.col(right_key).alias("_rk"), F.col(right_col).alias("_rs"))
    return (
        l.crossJoin(r)
        .select(
            F.col("_lk").alias(left_key),
            F.col("_rk").alias(right_key),
            F.levenshtein(F.col("_ls"), F.col("_rs")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )
