"""BPE vocabulary fit (operators/bpe.py): merge sequence against a
hand-derived example, encode behavior, early stop, partition invariance,
and the segment-stats rollup."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators import bpe


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang=lg)
            for i, (t, lg) in enumerate(zip(texts, langs))
        ]
    )


def test_merge_sequence_hand_derived(spark):
    # words: ab x3, cd x1. Initial pairs: (a,b)=3, (b,</w>)=3,
    # (c,d)=1, (d,</w>)=1. Tie at 3 -> lexicographically smallest:
    # ('a','b'). Then ('ab','</w>')=3 wins. min_count=2 stops before
    # the count-1 pairs.
    docs = _docs(spark, ["ab ab", "ab cd"])
    merges = bpe.learn_bpe_merges(docs, n_merges=10, min_count=2)
    assert merges == [("a", "b"), ("ab", "</w>")]


def test_merges_are_corpus_frequency_driven(spark):
    # "the" dominates -> its pairs merge first, full word within 3 merges
    docs = _docs(spark, ["the the the the zq", "the the the xv"])
    merges = bpe.learn_bpe_merges(docs, n_merges=3, min_count=1)
    # after 3 merges the whole word 'the</w>' is one symbol
    assert bpe._encode_word("the", {p: i for i, p in enumerate(merges)}) == [
        "the</w>"
    ]


def test_encode_word_greedy_lowest_rank(spark):
    ranks = {("a", "b"): 0, ("ab", "</w>"): 1}
    assert bpe._encode_word("ab", ranks) == ["ab</w>"]
    # unseen word falls back to chars + terminal (no applicable merges)
    assert bpe._encode_word("xy", ranks) == ["x", "y", "</w>"]


def test_early_stop_below_min_count(spark):
    docs = _docs(spark, ["aa bb"])  # every pair occurs once
    assert bpe.learn_bpe_merges(docs, n_merges=10, min_count=2) == []


def test_learn_partition_invariance(spark, documents):
    docs = documents.limit(200)
    a = bpe.learn_bpe_merges(docs, n_merges=30)
    b = bpe.learn_bpe_merges(docs.repartition(7), n_merges=30)
    assert a == b


def test_segment_stats_rollup(spark):
    docs = _docs(
        spark, ["ab ab cd", "ab", ""], langs=["en", "en", "fr"]
    )
    merges = [("a", "b"), ("ab", "</w>")]
    rows = {
        r["lang"]: r
        for r in bpe.bpe_segment_stats(docs, merges).collect()
    }
    # en: 4 words; 'ab'->1 subword each (x3), 'cd'->3 ('c','d','</w>')
    assert rows["en"]["n_docs"] == 2
    assert rows["en"]["n_words"] == 4
    assert rows["en"]["n_subwords"] == 3 * 1 + 3
    # empty doc: 0 words, still counted as a doc
    assert rows["fr"]["n_docs"] == 1 and rows["fr"]["n_words"] == 0


def test_vocab_learning_compresses_indomain_text(spark, documents):
    docs = documents.limit(300)
    merges = bpe.learn_bpe_merges(docs, n_merges=200)
    stats = bpe.bpe_segment_stats(docs, merges).agg(
        F.sum("n_words").alias("w"), F.sum("n_subwords").alias("s")
    ).first()
    chars = bpe.bpe_segment_stats(docs, []).agg(
        F.sum("n_subwords").alias("s")
    ).first()
    # merges must compress vs character segmentation, and every word
    # yields at least one subword
    assert stats["s"] < chars["s"]
    assert stats["s"] >= stats["w"]


def test_apply_bpe_token_stream(spark):
    """apply_bpe must emit the in-order subword stream with </w> markers,
    consistent with bpe_segment_stats' counts on the same merges."""
    from reddit_etl_pipeline_spark.operators.bpe import (
        apply_bpe,
        bpe_segment_stats,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(0, "low lower lowest", "en"), (1, "low low", "en"), (2, "", "en")],
        "doc_id long, text string, lang string",
    )
    merges = learn_bpe_merges(docs, n_merges=4, min_count=2)
    toks = {r.doc_id: r.subwords for r in apply_bpe(docs, merges).collect()}
    # every word's subwords concatenate back to word + </w>
    for did, text in [(0, "low lower lowest"), (1, "low low")]:
        joined = "".join(toks[did])
        assert joined == "</w>".join(text.split()) + "</w>"
    assert toks[2] == []
    # counts agree with bpe_segment_stats
    stats = {r.lang: r for r in bpe_segment_stats(docs, merges).collect()}
    assert stats["en"].n_subwords == sum(len(v) for v in toks.values())
    assert stats["en"].n_words == 5
