"""Fuzzy (edit-distance) string joins via q-gram blocking.

Entity resolution — matching names/titles/addresses across tables —
needs "join where edit_distance(a, b) ≤ k". The naive plan is a
cartesian product with a Levenshtein residual: O(n·m) distance
evaluations, a non-starter at scale. The standard blocking technique
(q-gram filtering, from the string-similarity-join literature) makes
it an equi-join: two strings within edit distance k share at least

    |G_q(a) ∩ G_q(b)| ≥ max(|a|, |b|) − q + 1 − k·q

positional-free q-grams, which is ≥ 1 whenever
``max(len) ≥ (k+1)·q``. So: explode each side into its distinct
q-grams, equi-join on the gram (a shuffle proportional to text
volume, not pairs²), dedup candidate key pairs, and evaluate the
exact Levenshtein residual only on candidates.

Strings too short for the guarantee (len < (k+1)·q on either side)
can miss every shared gram after k edits; they fall back to a
length-bucket block (|len(a) − len(b)| ≤ k is necessary for edit
distance ≤ k), which is exact and cheap precisely because the
fallback population is short strings. Both paths are plain
DataFrame joins — recall is provably 1.0, pinned against the
brute-force form in tests and against DuckDB's cross-join +
``levenshtein`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(df: DataFrame, keys: list[str], col: str, q: int) -> DataFrame:
    return (
        df.select(
            *[F.col(k) for k in keys],
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(col) - q + 1, F.lit(1))
                    ),
                    lambda i: F.col(col).substr(i, F.lit(q)),
                )
            ).alias("_gram"),
        )
        .filter(F.length("_gram") > 0)
        .distinct()
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

    Plan shape: q-gram explode (distinct grams per row) → gram
    equi-join → distinct candidate key pairs → exact residual; short
    strings route through a |len| ≤ k length-bucket block instead.
    No cartesian product anywhere — the gram join shuffles gram rows
    (≈ string length per row), candidates scale with gram
    collisions, and AQE handles hot grams like any skewed key
    (stop-gram capping is the knob if one gram dominates; not needed
    for key-like strings).

    Keys need NOT be unique: per-row identity inside the blocking is
    ``(key, xxhash64(string))``, so duplicate keys with different
    strings each keep their own rarest-gram prefix — grams never mix
    across strings inside one window partition (a 64-bit hash
    collision between two same-key strings is the only way to lose a
    match; at ~2⁻⁶⁴ per same-key string pair this is negligible and
    only ever local to one key).
    """
    k = int(max_distance)
    min_guaranteed = (k + 1) * q  # shortest length with ≥1 shared gram
    l = left.select(
        F.col(left_key).alias("_lk"),
        F.col(left_col).alias("_ls"),
        F.length(left_col).alias("_ll"),
        F.xxhash64(F.col(left_col)).alias("_lh"),
    )
    r = right.select(
        F.col(right_key).alias("_rk"),
        F.col(right_col).alias("_rs"),
        F.length(right_col).alias("_rl"),
        F.xxhash64(F.col(right_col)).alias("_rh"),
    )
    # long×long: PREFIX-FILTERED gram blocking (the ppjoin idea,
    # adapted to edit distance). Joining on ALL shared grams
    # degenerates on shared-prefix key families — every TPC-H
    # supplier name contains 'Supplier#0…' grams, so the gram join
    # alone emits n² (pair, gram) rows before any filter can help.
    # Instead each string keeps only its k·q+1 RAREST distinct grams
    # under one global order (ascending corpus frequency, gram as
    # tiebreak), and candidates come from those prefixes alone.
    # Recall proof: distance ≤ k ⇒ multiset |G(a)∩G(b)| ≥
    # max(len)−q+1−k·q, and the set intersection undercounts it by at
    # most a side's duplication surplus, giving set-threshold
    # T ≥ max(d_a, d_b) − k·q; the prefix-filter lemma then needs
    # prefixes of d − T + 1 ≤ k·q+1 grams — exactly what we keep
    # (strings with d ≤ k·q+1 keep everything, where the ≥1-shared-
    # gram guarantee applies directly). Hot common grams simply never
    # reach the join: supplier-name candidates drop from n² to the
    # digit-pattern near-matches.
    lg = _grams(
        l.filter(F.col("_ll") >= min_guaranteed), ["_lk", "_lh"], "_ls", q
    )
    rg = _grams(
        r.filter(F.col("_rl") >= min_guaranteed), ["_rk", "_rh"], "_rs", q
    )
    freq = (
        lg.select("_gram")
        .unionAll(rg.select("_gram"))
        .groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    prefix_n = k * q + 1

    def _prefix(g: DataFrame, keys: list[str]) -> DataFrame:
        # partition by (user key, string hash): one window per ROW's
        # string, so duplicate user keys can't truncate each other's
        # rarest-gram prefix
        w = Window.partitionBy(*keys).orderBy("_df", "_gram")
        return (
            g.join(freq, "_gram")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= prefix_n)
            .select(*keys, "_gram")
        )

    cand_long = (
        _prefix(lg, ["_lk", "_lh"]).join(_prefix(rg, ["_rk", "_rh"]), "_gram")
        .select("_lk", "_lh", "_rk", "_rh")
        .distinct()
    )
    # any pair touching a short string: length-bucket block (exact:
    # edit distance ≤ k forces |len(a) − len(b)| ≤ k). Explode the
    # SHORT side only across its k+1 compatible buckets.
    shorts_l = l.filter(F.col("_ll") < min_guaranteed).withColumn(
        "_bkt", F.explode(F.sequence(F.col("_ll") - k, F.col("_ll") + k))
    )
    cand_short_l = shorts_l.join(
        r.withColumn("_bkt", F.col("_rl")), "_bkt"
    ).select("_lk", "_lh", "_rk", "_rh")
    shorts_r = r.filter(
        (F.col("_rl") < min_guaranteed)
    ).withColumn(
        "_bkt", F.explode(F.sequence(F.col("_rl") - k, F.col("_rl") + k))
    )
    cand_short_r = (
        l.filter(F.col("_ll") >= min_guaranteed)
        .withColumn("_bkt", F.col("_ll"))
        .join(shorts_r, "_bkt")
        .select("_lk", "_lh", "_rk", "_rh")
    )
    cands = cand_long.unionByName(cand_short_l).unionByName(cand_short_r).distinct()
    joined = (
        cands.join(l.select("_lk", "_lh", "_ls").distinct(), ["_lk", "_lh"])
        .join(r.select("_rk", "_rh", "_rs").distinct(), ["_rk", "_rh"])
        .select(
            "_lk", "_rk", F.levenshtein(F.col("_ls"), F.col("_rs")).alias("distance")
        )
        .filter(F.col("distance") <= k)
    )
    return joined.select(
        F.col("_lk").alias(left_key),
        F.col("_rk").alias(right_key),
        "distance",
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
