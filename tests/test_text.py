"""Text analysis: tokens, quality, language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import Row

from lakehouse_tools_spark.ext.text import (
    fingerprints,
    language_scores,
    quality_features,
)
import lakehouse_tools_spark.ext.text as text_mod
from pyspark.sql import functions as F


def test_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="Hello, world! 42 tokens?")])
    out = df.select(
        text_mod.token_count(F.col("text")).alias("ws"),
        text_mod.regex_token_count(F.col("text")).alias("re"),
    ).first()
    assert out.ws == 4
    # hello , world ! 42 tokens ? -> 7 BPE-ish tokens
    assert out.re == 7


def test_quality_features_formula(spark):
    text = "the cat sat on the mat with a hat and a bat"  # 12 words, 43 chars
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    r = quality_features(df, "text", "doc_id").first()
    assert r.n_chars == 43 and r.n_words == 12
    # stopwords present: the, the, a, a, and -> 5 of 12
    assert abs(r.stopword_ratio - 5 / 12) < 1e-6
    assert r.punct_ratio == 0.0
    expected = 0.5 + 0.5 * r.stopword_ratio - 0.0 + 0.2
    assert abs(r.quality_score - expected) < 1e-6


def test_quality_score_clamped(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="!!! ??? ###")])
    r = quality_features(df, "text", "doc_id").first()
    assert r.quality_score == 0.0


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat is in the house and it is warm"),
            Row(doc_id=2, text="der hund ist ein tier und die katze auch"),
            Row(doc_id=3, text="le chat et la souris sont des animaux"),
        ]
    )
    out = {r.doc_id: r.lang_pred for r in language_scores(df, "text", "doc_id").collect()}
    assert out == {1: "en", 2: "de", 3: "fr"}


def test_fingerprints_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a  b\tc"), Row(doc_id=2, text="A B c")]
    )
    fps = [r.fingerprint for r in fingerprints(df, "text", "doc_id").collect()]
    assert fps[0] == fps[1]


def test_prepare_corpus_keep_first_dedup(spark):
    from lakehouse_tools_spark.ext.corpus import prepare_corpus

    good = "the cat and the dog went to the house of a friend in town is nice"
    df = spark.createDataFrame(
        [
            Row(doc_id=5, text=good),
            Row(doc_id=3, text=good.upper()),  # same normalized content
            Row(doc_id=9, text="the " + good),
            Row(doc_id=1, text="@@@ ### !!!"),  # punct-heavy → filtered
        ]
    )
    out = prepare_corpus(df, min_quality=0.3).collect()
    by_id = {r.doc_id: r for r in out}
    assert 1 not in by_id  # quality cut
    assert 3 in by_id and 5 not in by_id  # keep-first: min id wins
    assert by_id[3].n_dups == 2
    assert by_id[9].n_dups == 1


def test_prepare_corpus_language_filter(spark):
    from lakehouse_tools_spark.ext.corpus import prepare_corpus

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat is in the house and it is warm today here now"),
            Row(doc_id=2, text="der hund ist ein tier und die katze auch hier heute warm"),
        ]
    )
    out = prepare_corpus(df, min_quality=0.0, langs=("en",)).collect()
    assert [r.doc_id for r in out] == [1]


def test_tfidf_keywords_ranking(spark):
    # 3 docs: "apple" appears in one doc only (high idf), "the" in all
    # (low idf); per-doc top-k must prefer the rare term.
    rows = [
        Row(doc_id=1, text="apple apple banana the the the"),
        Row(doc_id=2, text="banana cherry the the"),
        Row(doc_id=3, text="cherry cherry cherry the"),
    ]
    df = spark.createDataFrame(rows)
    out = text_mod.tfidf_keywords(df, "text", "doc_id", k=2)
    rows_out = {(r.doc_id, r.rank): r for r in out.collect()}
    # every doc has exactly k=2 ranked keywords (enough vocab)
    assert set(rows_out) == {(d, r) for d in (1, 2, 3) for r in (1, 2)}
    # doc 1's top keyword is apple: tf=2 and df=1 beats "the" (df=3)
    assert rows_out[(1, 1)].word == "apple"
    # doc 3's top keyword is cherry (tf=3, df=2)
    assert rows_out[(3, 1)].word == "cherry"
    # df of "the" is 3 (appears in all docs), idf floor keeps it finite
    the_rows = [r for r in rows_out.values() if r.word == "the"]
    assert all(r.df == 3 for r in the_rows)
    # scores strictly ordered within each doc (no accidental ties here)
    for d in (1, 2, 3):
        assert rows_out[(d, 1)].score >= rows_out[(d, 2)].score


def test_tfidf_keywords_min_word_len(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="ab abc abcd xyz xyz")]
    )
    out = text_mod.tfidf_keywords(df, "text", "doc_id", k=10, min_word_len=3)
    words = {r.word for r in out.collect()}
    assert "ab" not in words and {"abc", "abcd", "xyz"} == words


def test_bigram_counts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b"),
            Row(doc_id=2, text="a b c"),
            Row(doc_id=3, text="solo"),
        ]
    )
    out = {r.bigram: r for r in text_mod.bigram_counts(df, "text", "doc_id").collect()}
    # "a b": twice in doc 1 (positions 0 and 2) + once in doc 2
    assert out["a b"].n_total == 3 and out["a b"].n_docs == 2
    assert out["b a"].n_total == 1 and out["b c"].n_total == 1
    # 1-token doc contributes nothing
    assert set(out) == {"a b", "b a", "b c"}


def test_unigram_logprob_orders_rarity(spark):
    # doc 2 is all rare words -> higher mean negative log-prob than
    # doc 1, which repeats the corpus-common word.
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common common"),
            Row(doc_id=2, text="rare1 rare2 rare3 rare4"),
        ]
    )
    out = {r.doc_id: r for r in text_mod.unigram_logprob(df, "text", "doc_id").collect()}
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4
    assert out[2].mean_nll > out[1].mean_nll
    # Laplace-smoothed probabilities: p(common) = (4+1)/(8+5)
    import math

    expected = math.floor(-math.log(5 / 13) * 1e6) / 1e6
    assert abs(out[1].mean_nll - expected) < 2e-6


def test_pmi_ranks_collocation_over_frequency(spark):
    # "strong coffee" always co-occurs; "the cat"/"the dog" share the
    # frequent "the" -> PMI must rank the exclusive pair first even
    # though raw counts are equal.
    rows = [
        Row(doc_id=i, text="strong coffee the cat the dog") for i in range(3)
    ]
    df = spark.createDataFrame(rows)
    out = text_mod.pmi_bigrams(df, "text", "doc_id", min_count=1, top=10)
    ranked = [r.bigram for r in out.collect()]
    assert ranked[0] == "strong coffee"
    assert ranked.index("strong coffee") < ranked.index("the cat")
    # min_count prunes the tail
    assert text_mod.pmi_bigrams(df, "text", "doc_id", min_count=4).count() == 0


def test_learn_bpe_merges_classic(spark):
    # the textbook BPE example: "aaab" repeated -> first merge (a, a)
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab"), Row(doc_id=2, text="aaab ab")]
    )
    merges = text_mod.learn_bpe_merges(df, "text", num_merges=3)
    assert merges[0] == ("a", "a")
    # second round: sequences are (aa,a,b)x3-ish and (a,b); most
    # frequent adjacent pair is now (aa, b) [3] vs (aa,a)... verify
    # against an independent recount
    assert len(merges) == 3 and len(set(merges)) == 3
    # determinism
    assert merges == text_mod.learn_bpe_merges(df, "text", num_merges=3)


def test_learn_bpe_merges_tiebreak_lexicographic(spark):
    # "ab" and "cd" both appear once -> tie; lexicographically
    # smallest pair ("a","b") must win
    df = spark.createDataFrame([Row(doc_id=1, text="ab cd")])
    merges = text_mod.learn_bpe_merges(df, "text", num_merges=1)
    assert merges == [("a", "b")]


def test_apply_bpe_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="aaab ab cd")])
    merges = text_mod.learn_bpe_merges(df, "text", num_merges=2)
    out = {r.doc_id: r.n_tokens for r in text_mod.apply_bpe(
        df, "text", "doc_id", merges
    ).collect()}
    # with zero merges every char is a token: 4 + 2 + 2 = 8
    none = {r.doc_id: r.n_tokens for r in text_mod.apply_bpe(
        df, "text", "doc_id", []
    ).collect()}
    assert none[1] == 8
    # merges strictly compress and never go below one token per word
    assert 3 <= out[1] < 8


def test_repetition_signals_hand_computed(spark):
    """'a b a b a': 5 words (2 distinct → ratio 0.4, top 'a' 3/5),
    4 bigrams (top 'a b' 2/4), 3 trigrams (top 'a b a' 2/3)."""
    from lakehouse_tools_spark.ext.text import repetition_signals

    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    [r] = repetition_signals(df, "text", "doc_id").collect()
    assert r.n_words == 5
    assert r.distinct_word_ratio == 0.4
    assert r.top_word_frac == 0.6
    assert r.top_bigram_frac == 0.5
    assert abs(r.top_trigram_frac - 0.666666) < 1e-9


def test_repetition_signals_short_doc_null_grams(spark):
    """A 2-word doc has no trigram: the fraction is null (no gram of
    that size exists), not 0."""
    from lakehouse_tools_spark.ext.text import repetition_signals

    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    [r] = repetition_signals(df, "text", "doc_id").collect()
    assert r.n_words == 2 and r.top_bigram_frac == 1.0
    assert r.top_trigram_frac is None


def test_learn_bpe_caps_nonbinding_equal_uncapped(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab cd"), Row(doc_id=2, text="aaab ab")]
    )
    base = text_mod.learn_bpe_merges(df, "text", num_merges=3)
    # caps wider than the data change nothing
    assert base == text_mod.learn_bpe_merges(
        df, "text", num_merges=3, min_freq=1, max_vocab=1000
    )


def test_learn_bpe_min_freq_drops_only_tail_words(spark):
    # "zq" is a hapax; the head pair statistics come from "aaab" (x5).
    # Dropping the tail must keep the head merges identical.
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaab aaab aaab"),
            Row(doc_id=2, text="aaab aaab zq"),
        ]
    )
    full = text_mod.learn_bpe_merges(df, "text", num_merges=2)
    capped = text_mod.learn_bpe_merges(df, "text", num_merges=2, min_freq=2)
    assert capped == full
    # and the capped run is exactly the uncapped run on the freq>=2 vocab
    kept = spark.createDataFrame([Row(doc_id=1, text="aaab " * 5)])
    assert capped == text_mod.learn_bpe_merges(kept, "text", num_merges=2)


def test_learn_bpe_max_vocab_keeps_top_words(spark):
    # max_vocab=1 keeps only the most frequent word ("aaab", freq 3 >
    # "cd" freq 2); merges must equal training on that word alone
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab cd"), Row(doc_id=2, text="aaab cd")]
    )
    capped = text_mod.learn_bpe_merges(df, "text", num_merges=3, max_vocab=1)
    solo = spark.createDataFrame([Row(doc_id=1, text="aaab aaab aaab")])
    assert capped == text_mod.learn_bpe_merges(solo, "text", num_merges=3)


def test_learn_bpe_cap_validation(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=1, text="ab")])
    with pytest.raises(ValueError):
        text_mod.learn_bpe_merges(df, "text", min_freq=0)
    with pytest.raises(ValueError):
        text_mod.learn_bpe_merges(df, "text", max_vocab=0)


def _bpe_encode_ref(word: str, merges: list[tuple[str, str]]) -> int:
    """Pure-Python reference BPE encode (token count for one word)."""
    rank = {tuple(p): i for i, p in enumerate(merges)}
    seq = list(word)
    while len(seq) > 1:
        pairs = [
            (rank.get((a, b)), i)
            for i, (a, b) in enumerate(zip(seq, seq[1:]))
        ]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        _, i = min(pairs)
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    return len(seq)


def test_apply_bpe_wide_vocab_matches_reference(spark):
    """Wide-vocabulary property (VERDICT r09 item 2): the distributed
    encode — mapInPandas over the distinct-word relation joined back
    to per-(doc, word) counts — must equal a pure-Python per-word
    reference on a corpus with 2,000 distinct words, far beyond what
    the removed driver-side create_map route was sized for. Also
    exercises merge chains (a merge whose left side is itself a
    merged symbol)."""
    import itertools
    import random

    rng = random.Random(7)
    # 6^5 = 7776 candidate words; the slice keeps the advertised 2,000
    vocab = [
        "".join(p) for p in itertools.product("abcdef", repeat=5)
    ][:2000]
    assert len(vocab) == 2000
    docs = [
        Row(doc_id=d, text=" ".join(rng.choices(vocab, k=120)))
        for d in range(40)
    ]
    df = spark.createDataFrame(docs)
    merges = [("a", "b"), ("c", "d"), ("ab", "c"), ("e", "f"), ("b", "c")]
    got = {
        r.doc_id: r.n_tokens
        for r in text_mod.apply_bpe(df, "text", "doc_id", merges).collect()
    }
    want = {
        d.doc_id: sum(_bpe_encode_ref(w, merges) for w in d.text.split(" "))
        for d in docs
    }
    assert got == want


def test_learn_bpe_default_cap_is_real_and_nonbinding_on_small_corpora(spark):
    # the default is a genuine bound (not None) and, when wider than
    # the data, changes nothing vs an explicit cap
    assert text_mod.DEFAULT_BPE_MAX_VOCAB == 65536
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab cd"), Row(doc_id=2, text="aaab ab")]
    )
    assert text_mod.learn_bpe_merges(
        df, "text", num_merges=3
    ) == text_mod.learn_bpe_merges(
        df, "text", num_merges=3, max_vocab=None
    )


def test_apply_bpe_property_random_corpora_and_merges(spark):
    """Property: for arbitrary corpora and arbitrary merge tables, the
    distributed encode (distinct words -> mapInPandas -> join-back ->
    per-doc sum) equals the per-document pure-Python reference. The
    reference encodes each document directly, so this exercises the
    relational plumbing (explode/normalize, distinct, join keys,
    count multiplication) independently of the per-word merge loop."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="ab", min_size=1, max_size=5)
    docs_strategy = st.lists(
        st.lists(words, min_size=1, max_size=6), min_size=1, max_size=5
    )
    symbols = st.text(alphabet="ab", min_size=1, max_size=2)
    merges_strategy = st.lists(
        st.tuples(symbols, symbols), min_size=0, max_size=4
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs=docs_strategy, merges=merges_strategy)
    def check(docs, merges):
        merges = list(dict.fromkeys(merges))  # ranked, first occurrence wins
        rows = [
            Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)
        ]
        got = {
            r.doc_id: r.n_tokens
            for r in text_mod.apply_bpe(
                spark.createDataFrame(rows), "text", "doc_id", merges
            ).collect()
        }
        want = {
            i: sum(_bpe_encode_ref(w, merges) for w in ws)
            for i, ws in enumerate(docs)
        }
        assert got == want

    check()


# ------------------------------------------------------- fertility report

#: The fixed merge table the registered fertility report uses
#: (mirrors __spark_entry__._BPE_REPORT_MERGES — duplicated here so
#: the package test has no dependency on the driver contract file).
_FERTILITY_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("r", "e"), ("a", "t"), ("e", "s"), ("o", "r"),
]


def test_bpe_fertility_report_hand_computed(spark):
    """'the then in' + 'the': words the(x2)/then/in; encodes under
    the fixed table: the->[the], then->[the,n], in->[in]."""
    from lakehouse_tools_spark.ext.text import bpe_fertility_report

    df = spark.createDataFrame(
        [Row(doc_id=1, text="the then in"), Row(doc_id=2, text="the")]
    )
    [r] = bpe_fertility_report(
        df, "text", "doc_id", _FERTILITY_MERGES
    ).collect()
    assert r.n_docs == 2
    assert r.n_words == 4
    assert r.n_distinct_words == 3
    assert r.n_chars == 3 + 4 + 2 + 3
    # the=1 token (x2), then=2, in=1 -> 5 tokens
    assert r.n_tokens == 5
    # distinct tokens used: the, n, in
    assert r.n_distinct_tokens == 3
    assert r.fertility == 1.25
    assert r.whole_word_rate == 0.75  # 3 of 4 occurrences one-token
    assert r.tokens_per_doc == 2.5


def test_bpe_fertility_report_matches_apply_bpe_totals(spark):
    """The report's corpus token total must equal apply_bpe's per-doc
    totals summed — same encode semantics, two independent plans."""
    from lakehouse_tools_spark.ext.text import (
        apply_bpe,
        bpe_fertility_report,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the rat sat on the other thin mat"),
            Row(doc_id=2, text="another anthem in the north"),
            Row(doc_id=3, text="tttt hhhh thethe ananan"),
        ]
    )
    [r] = bpe_fertility_report(
        df, "text", "doc_id", _FERTILITY_MERGES
    ).collect()
    per_doc = apply_bpe(df, "text", "doc_id", _FERTILITY_MERGES)
    total = sum(x.n_tokens for x in per_doc.collect())
    assert r.n_tokens == total
    assert r.n_words == 8 + 5 + 4


def test_bpe_fertility_report_sequential_equals_iterative(spark):
    """The oracle replays the encode as one global left-to-right pass
    per merge rule IN RANK ORDER; for the fixed table (no rule's
    product is a later rule's operand) that must equal the iterative
    lowest-rank encode on adversarial words."""
    from lakehouse_tools_spark.ext.text import bpe_fertility_report

    words = [
        "th", "the", "ththe", "thethe", "atat", "eses", "ananan",
        "tthhee", "ttthhheee", "ininin", "thethethe", "ratther",
        "northerneses", "inonator",
    ]

    def seq_encode(word: str) -> int:
        toks = list(word)
        for a, b in _FERTILITY_MERGES:
            out: list[str] = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return len(toks)

    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    [r] = bpe_fertility_report(
        df, "text", "doc_id", _FERTILITY_MERGES
    ).collect()
    want = sum(seq_encode(w) for w in words)
    iterative = sum(_bpe_encode_ref(w, _FERTILITY_MERGES) for w in words)
    assert want == iterative  # table property: the two routes agree
    assert r.n_tokens == want


def test_bpe_fertility_report_empty_merges_chars(spark):
    from lakehouse_tools_spark.ext.text import bpe_fertility_report

    df = spark.createDataFrame([Row(doc_id=1, text="ab cde")])
    [r] = bpe_fertility_report(df, "text", "doc_id", []).collect()
    assert r.n_tokens == r.n_chars == 5
    assert r.whole_word_rate == 0.0
    assert r.chars_per_token == 1.0
