"""Unit tests for corpus quality filters (repetition, contamination) and
PII scrubbing — crafted fixtures that exercise the signal the synthetic
testdata corpus doesn't reach (clean word-soup text never trips the
Gopher thresholds, and carries no PII)."""

import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.functions.pii import pii_counts, scrub_pii
from reddit_etl_pipeline_spark.operators.text_quality import (
    contaminated_doc_ids,
    contamination_summary,
    repetition_stats,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_word_ngrams_basic(spark):
    df = _docs(spark, [(1, "A b a B", "s"), (2, "one", "s"), (3, "", "s")])
    got = {
        (r.doc_id, r.gram)
        for r in word_ngrams(df, 2).collect()
    }
    # lowercased, consecutive pairs only; short/empty docs yield none
    assert got == {(1, "a b"), (1, "b a"), (1, "a b")} | set()
    assert {r.doc_id for r in word_ngrams(df, 2).collect()} == {1}


def test_repetition_stats_flags_repeated_phrase(spark):
    spammy = "buy now " * 30  # 60 tokens, one 2-gram dominates
    clean = "the quick brown fox jumps over the lazy dog today"
    df = _docs(spark, [(1, spammy.strip(), "s"), (2, clean, "s"), (3, "x", "s")])
    out = {r.doc_id: r for r in repetition_stats(df).collect()}

    assert out[1].gopher_flag == 1
    assert out[1].dup_2gram_frac > 0.9
    assert out[1].top_2gram_frac > 0.4  # "now buy"/"buy now" split the mass
    # clean prose: only "the" repeats, no repeated 2-grams
    assert out[2].gopher_flag == 0
    assert out[2].dup_2gram_frac == 0.0
    # single-token doc: no 2-grams at all, every frac 0
    assert out[3].n_2grams == 0
    assert out[3].dup_2gram_frac == 0.0 and out[3].top_2gram_frac == 0.0


def test_repetition_symbol_ratio(spark):
    df = _docs(spark, [(1, "a b !!!!!!", "s")])
    r = repetition_stats(df).collect()[0]
    # 6 symbol chars / 3 tokens = 2.0 -> flagged
    assert r.symbol_word_ratio == pytest.approx(2.0)
    assert r.gopher_flag == 1


def test_contamination_detects_benchmark_overlap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    corpus = _docs(
        spark,
        [
            (1, f"intro words {shared} trailing text here", "a"),
            (2, "totally different content with no overlap at all ok", "a"),
            (3, "short doc", "b"),
            (100, f"benchmark question {shared} benchmark answer", "a"),
        ],
    )
    bench = corpus.filter(F.col("doc_id") == 100)
    hits = {r.doc_id for r in contaminated_doc_ids(corpus, bench, n=8).collect()}
    assert 1 in hits and 2 not in hits and 3 not in hits

    summary = {
        r.source: (r.n_docs, r.n_contaminated)
        for r in contamination_summary(corpus, bench, n=8).collect()
    }
    # benchmark doc excluded from the scanned corpus
    assert summary == {"a": (2, 1), "b": (1, 0)}


def test_pii_scrub_and_counts(spark):
    text = (
        "mail me at jane.doe+spam@sub.example.co.uk or call 555-123-4567; "
        "server at 192.168.1.254 (backup 10.0.0.1) mail2: a_b%c@x.io"
    )
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        scrub_pii("text").alias("s"), *pii_counts("text")
    ).collect()[0]
    assert row.n_email == 2 and row.n_phone == 1 and row.n_ip == 2
    s = row.s
    assert "<EMAIL>" in s and "<PHONE>" in s and s.count("<IP>") == 2
    assert "jane.doe" not in s and "555-123" not in s and "192.168" not in s


def test_pii_no_cross_counting(spark):
    # the email's digits must not re-count as phone/ip, and a version
    # string glued to a word char ("v1.2.3.4") must NOT match the
    # boundary-anchored IP rule — only the standalone quad does
    df = spark.createDataFrame(
        [("v1.2.3.4 of pkg at 1.2.3.4 by bob555@mail123.example.org",)],
        "text string",
    )
    row = df.select(scrub_pii("text").alias("s"), *pii_counts("text")).collect()[0]
    assert row.n_email == 1
    assert row.n_phone == 0
    assert row.n_ip == 1
    assert row.s == "v1.2.3.4 of pkg at <IP> by <EMAIL>"


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii here at all",)], "text string")
    row = df.select(scrub_pii("text").alias("s"), *pii_counts("text")).collect()[0]
    assert row.s == "no pii here at all"
    assert row.n_email == row.n_phone == row.n_ip == 0


def test_bigram_pmi_favors_exclusive_collocation(spark):
    """A bigram whose tokens appear ONLY together must out-score one
    whose tokens also occur independently; counts below min_count drop."""
    from reddit_etl_pipeline_spark.functions.text import bigram_pmi_topk

    docs = spark.createDataFrame(
        [
            # "new york" always together (5x); "big apple" tokens also
            # appear apart (apple pie, big deal), diluting its PMI
            (1, "new york new york new york big apple apple pie"),
            (2, "new york new york big apple big deal apple pie"),
            (3, "rare pair"),  # count 1 < min_count -> dropped
        ],
        ["doc_id", "text"],
    )
    out = bigram_pmi_topk(docs, min_count=2, k=10)
    rows = {(r["tok_a"], r["tok_b"]): r for r in out.collect()}
    assert ("rare", "pair") not in rows
    assert ("new", "york") in rows and ("big", "apple") in rows
    assert rows[("new", "york")]["pmi"] > rows[("big", "apple")]["pmi"]
    assert rows[("new", "york")]["n_ab"] == 5


def test_bigram_pmi_empty_and_single_token_docs(spark):
    from reddit_etl_pipeline_spark.functions.text import bigram_pmi_topk

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "  ")], ["doc_id", "text"]
    )
    assert bigram_pmi_topk(docs, min_count=1).count() == 0


def test_c4_filter_stats_rules(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.operators.text_quality import c4_filter_stats

    good = "\n".join(["This line has five good words."] * 3)
    docs = spark.createDataFrame([
        Row(doc_id=1, text=good),                       # keeps
        Row(doc_id=2, text=good + "\nshort."),          # extra bad line, keeps
        Row(doc_id=3, text=good.replace("good", "{x}")),  # curly -> drop
        Row(doc_id=4, text=good + "\nLorem Ipsum dolor"),  # lorem -> drop
        Row(doc_id=5, text="no terminal punctuation here at all\nx y"),
    ])
    rows = {r["doc_id"]: r for r in c4_filter_stats(docs).collect()}
    assert rows[1]["would_keep"] == 1 and rows[1]["n_retained_lines"] == 3
    assert rows[2]["would_keep"] == 1 and rows[2]["n_retained_lines"] == 3
    assert rows[3]["would_keep"] == 0 and rows[3]["has_curly"] == 1
    assert rows[4]["would_keep"] == 0 and rows[4]["has_lorem"] == 1
    assert rows[5]["would_keep"] == 0 and rows[5]["n_retained_lines"] == 0


def test_sentiment_rollup_lexicon_math(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.functions.text import sentiment_rollup

    docs = spark.createDataFrame([
        Row(doc_id=1, text="good good bad", lang="en"),     # 3+3-3 = 3
        Row(doc_id=2, text="terrible awful", lang="en"),    # -6
        Row(doc_id=3, text="neutral words only", lang="fr"),  # 0
        Row(doc_id=4, text="", lang="fr"),                  # no tokens -> 0
    ])
    rows = {r["lang"]: r for r in sentiment_rollup(docs).collect()}
    assert rows["en"]["n_docs"] == 2
    assert rows["en"]["sum_valence"] == 3 - 6
    assert rows["en"]["pos_doc_frac"] == 0.5
    assert rows["fr"]["n_docs"] == 2 and rows["fr"]["sum_valence"] == 0
    assert rows["fr"]["pos_doc_frac"] == 0.0


def test_readability_hand_computed(spark):
    """FK grade vs hand arithmetic on constructed texts, including the
    negative-grade case that exercises the positivity shift (div vs //
    disagree on negative numerators)."""
    from reddit_etl_pipeline_spark.operators.text_quality import (
        readability_stats,
    )

    rows = [
        (1, "The cat sat. The dog ran!"),      # simple, negative grade
        (2, "Extraordinarily complicated terminology necessitates "
            "comprehension. Unquestionably."),
        (3, ""),                                # no words -> absent
        (4, None),                              # null -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability_stats(df).collect()}
    assert set(got) == {1, 2}

    def syl(word):
        import re

        return max(1, len(re.findall(r"[aeiouy]+", word.lower())))

    for did, text in rows[:2]:
        import re

        ws = [w for w in text.lower().split() if w]
        w, se = len(ws), max(1, len(re.findall(r"[.!?]+", text)))
        s = sum(syl(x) for x in ws)
        expect = (
            390000 * w * w + 11800000 * s * se - 15590000 * w * se
            + 16000000 * w * se
        ) // (w * se) - 16000000
        r = got[did]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, se, s)
        assert r.fk_grade_micro == expect, (did, r.fk_grade_micro, expect)
    # doc 1 is genuinely below grade 0; doc 2 far above doc 1
    assert got[1].fk_grade_micro < 0 < got[2].fk_grade_micro


class TestSourceVocabOverlap:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )

    def test_hand_computed_jaccard(self, spark):
        from reddit_etl_pipeline_spark.operators.text_quality import (
            source_vocab_overlap,
        )

        docs = self._docs(
            spark,
            [
                ("A", "the cat sat"),        # vocab A: the cat sat
                ("B", "the dog sat down"),   # vocab B: the dog sat down
            ],
        )
        r = source_vocab_overlap(docs).collect()[0]
        # common {the, sat}=2; union = 3 + 4 - 2 = 5
        assert (r.source_a, r.source_b) == ("A", "B")
        assert (r.vocab_a, r.vocab_b, r.common) == (3, 4, 2)
        assert r.jaccard_micro == 2 * 1_000_000 // 5

    def test_disjoint_sources_missing_pair(self, spark):
        from reddit_etl_pipeline_spark.operators.text_quality import (
            source_vocab_overlap,
        )

        # no shared token -> the pair never materializes (join-generated)
        docs = self._docs(spark, [("A", "alpha beta"), ("B", "gamma")])
        assert source_vocab_overlap(docs).count() == 0

    def test_case_folding_dedup(self, spark):
        from reddit_etl_pipeline_spark.operators.text_quality import (
            source_vocab_overlap,
        )

        docs = self._docs(spark, [("A", "The THE the"), ("B", "the")])
        r = source_vocab_overlap(docs).collect()[0]
        assert (r.vocab_a, r.vocab_b, r.common) == (1, 1, 1)
        assert r.jaccard_micro == 1_000_000


class TestZipfCurve:
    def test_power_of_two_ranks_and_values(self, spark):
        from reddit_etl_pipeline_spark.operators.text_quality import (
            zipf_curve,
        )

        # frequencies: w1 x8, w2 x4, w3 x2, w4 x1
        text = " ".join(["w1"] * 8 + ["w2"] * 4 + ["w3"] * 2 + ["w4"])
        docs = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        rows = zipf_curve(docs).collect()
        got = {r.rank: (r.token, r.freq) for r in rows}
        assert got == {1: ("w1", 8), 2: ("w2", 4), 4: ("w4", 1)}
        assert [r.rank for r in rows] == [1, 2, 4]

    def test_rank_tiebreak_is_token_order(self, spark):
        from reddit_etl_pipeline_spark.operators.text_quality import (
            zipf_curve,
        )

        docs = spark.createDataFrame(
            [(1, "b a c", "en", "s", 5)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        rows = zipf_curve(docs).collect()
        assert [(r.rank, r.token) for r in rows] == [(1, "a"), (2, "b")]
