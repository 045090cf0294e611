"""Text analysis operators: quality scoring, language ID, token
counting, fingerprinting.

All pure built-in expressions (split/regexp/length/md5) — these run
in whole-stage codegen over string columns, no Python in the hot
path, and every output is reproducible in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_tools_spark.ext.dedup import normalize_text
from lakehouse_tools_spark.functions.portable import floor6

#: BPE-ish token pattern: letter runs, digit runs, single other glyph.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny deterministic stopword lists for the n-gram/lexicon language
#: heuristic. Real language ID would ship larger n-gram tables; the
#: operator shape (score per language, argmax) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count of normalized text."""
    return F.size(F.split(normalize_text(col), " "))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count (letters / digits / punctuation glyphs)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features + a composite score.

    Features: char length, word count, mean word length, stopword
    ratio, non-alpha glyph ratio. Score is a fixed linear combination
    clamped to [0,1] — the standard shape of corpus quality filters;
    thresholds are caller policy.
    """
    # words materialized in their own projection: the filter() lambda
    # below defeats subexpression elimination, so an inline split would
    # be re-evaluated per feature column (see ext.dedup.word_shingles)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_words"),
    )
    df, t, words = base, F.col("_t"), F.col("_words")
    id_col = "doc_id"
    n_words = F.size(words)
    n_chars = F.length(t)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
    )
    mean_wlen = floor6((n_chars - (n_words - 1)) / n_words)
    stop_ratio = floor6(n_stop / n_words)
    punct_ratio = floor6(n_punct / n_chars)
    score = floor6(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.lit(0.5)
                + F.lit(0.5) * stop_ratio
                - F.lit(2.0) * punct_ratio
                + F.when((n_words >= 10) & (n_words <= 5000), 0.2).otherwise(-0.2),
            ),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Lexicon-hit language ID: fraction of tokens matching each
    language's marker list; predicted language = argmax with
    deterministic (alphabetical) tiebreak. Output:
    ``(doc_id, lang_pred, score)``.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_words"),
    )
    words = F.col("_words")
    n = F.size(words)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array([F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(markers, w)))
        scores.append(floor6(hits / n).alias(f"score_{lang}"))
    scored = base.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"score_{l}") for l in sorted(LANG_MARKERS)])
    pred = F.coalesce(
        *[
            F.when(F.col(f"score_{l}") == best, F.lit(l))
            for l in sorted(LANG_MARKERS)
        ]
    )
    return scored.select("doc_id", pred.alias("lang_pred"), best.alias("score"))


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + length — the
    document identity record exact dedup and lineage tracking key on."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
