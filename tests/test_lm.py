"""Bigram LM perplexity gate (operators/lm.py): probability math against
hand-computed values, OOV/floor fallbacks, unscorable-doc exclusion,
partition invariance, and the sampled-threshold production bucketing
path vs the exact NTILE reference."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators import lm

MICRO = lm.MICRO


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg) for i, (t, lg) in enumerate(zip(texts, langs))]
    )


def test_train_matches_hand_computed_laplace(spark):
    # corpus "a b a b" -> bigrams: (a,b) x2, (b,a) x1
    # V = distinct targets {a, b} = 2; c(a)=2, c(b)=1
    likes, ctxs, oov = lm.lm_train(_docs(spark, ["a b a b"]))
    lk = {(r["w1"], r["w2"]): r["l_unats"] for r in likes.collect()}
    assert lk[("a", "b")] == round(math.log(3 / 4) * MICRO)  # (2+1)/(2+2)
    assert lk[("b", "a")] == round(math.log(2 / 3) * MICRO)  # (1+1)/(1+2)
    fl = {r["w1"]: r["floor_unats"] for r in ctxs.collect()}
    assert fl["a"] == round(math.log(1 / 4) * MICRO)
    assert fl["b"] == round(math.log(1 / 3) * MICRO)
    assert oov == round(math.log(1 / 2) * MICRO)


def test_score_seen_floor_and_oov_paths(spark):
    likes, ctxs, oov = lm.lm_train(_docs(spark, ["a b a b"]))
    # "a b" seen; "a a" unseen pair with seen context a; "z z" OOV context
    scored = lm.lm_score(
        _docs(spark, ["a b", "a a", "z z"]), likes, ctxs, oov
    )
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert rows[0]["avg_nll_unats"] == -round(math.log(3 / 4) * MICRO)
    assert rows[1]["avg_nll_unats"] == -round(math.log(1 / 4) * MICRO)
    assert rows[2]["avg_nll_unats"] == -round(math.log(1 / 2) * MICRO)
    assert all(r["n_bigrams"] == 1 for r in rows.values())


def test_unscorable_docs_excluded(spark):
    likes, ctxs, oov = lm.lm_train(_docs(spark, ["a b c"]))
    scored = lm.lm_score(
        _docs(spark, ["one", "", "   ", "two words"]), likes, ctxs, oov
    )
    assert sorted(r["doc_id"] for r in scored.collect()) == [3]


def test_reference_like_docs_score_lower(spark):
    ref = ["the cat sat on the mat"] * 5 + ["the dog sat on the rug"] * 5
    likes, ctxs, oov = lm.lm_train(_docs(spark, ref))
    scored = lm.lm_score(
        _docs(spark, ["the cat sat on the mat", "zq xv qq pw zz yy"]),
        likes, ctxs, oov,
    )
    rows = {r["doc_id"]: r["avg_nll_unats"] for r in scored.collect()}
    assert rows[0] < rows[1]


def test_partition_invariance(spark, documents):
    docs = documents.limit(200)
    likes, ctxs, oov = lm.lm_train(docs)
    a = lm.lm_score(docs, likes, ctxs, oov).collect()
    likes2, ctxs2, oov2 = lm.lm_train(docs.repartition(7))
    b = lm.lm_score(docs.repartition(13), likes2, ctxs2, oov2).collect()
    assert oov == oov2
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_perplexity_buckets_shape_and_counts(spark, documents):
    docs = documents.limit(400)
    out = lm.perplexity_buckets(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    rows = out.collect()
    assert set(out.columns) == {
        "lang", "bucket", "n_docs", "min_avg_nll", "max_avg_nll"
    }
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        # NTILE(3): bucket sizes differ by at most 1
        sizes = [b["n_docs"] for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1
        # score ranges ordered head <= middle <= tail
        if {"head", "middle", "tail"} <= set(buckets):
            assert buckets["head"]["max_avg_nll"] <= buckets["middle"]["min_avg_nll"]
            assert buckets["middle"]["max_avg_nll"] <= buckets["tail"]["min_avg_nll"]


def test_bucket_thresholds_agree_with_ntile(spark, documents):
    docs = documents.limit(300)
    likes, ctxs, oov = lm.lm_train(docs)
    scored = lm.lm_score(
        docs, likes, ctxs, oov, extra_cols=["lang"]
    ).localCheckpoint()
    cuts = lm.bucket_thresholds(scored, rel_err=0.0)  # exact at test scale
    # bucketing by exact-quantile cutoffs reproduces tercile sizes within
    # tie-inflation (ties at a cutoff all land in the lower bucket)
    for lang, (c1, c2) in cuts.items():
        sub = scored.filter(F.col("lang") == lang)
        n = sub.count()
        lo = sub.filter(F.col("avg_nll_unats") <= c1).count()
        assert lo >= n // 3  # never undershoots the exact tercile


def test_train_on_unscorable_corpus_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="no bigrams"):
        lm.lm_train(_docs(spark, ["one", ""]))
