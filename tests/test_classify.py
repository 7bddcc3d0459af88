"""Multinomial NB classifier: separable-corpus accuracy, OOV prior
fallback, deterministic tie-break, and integer-score exactness under
repartitioning (the property that makes the driver query oracle-exact)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators.classify import (  # noqa: E402
    nb_confusion,
    nb_predict,
    nb_train,
)

SCHEMA = "doc_id long, lang string, text string"


import pytest

def _train_docs(spark):
    rows = []
    for i in range(20):
        rows.append((100 + i, "en", "the quick brown fox jumps over the lazy dog"))
        rows.append((200 + i, "fr", "le renard brun rapide saute par dessus le chien"))
    return spark.createDataFrame(rows, SCHEMA)


def test_separable_corpus_classifies_perfectly(spark):
    train = _train_docs(spark)
    test = spark.createDataFrame(
        [
            (1, "en", "the dog jumps"),
            (2, "fr", "le chien saute"),
            (3, "en", "quick brown fox"),
            (4, "fr", "renard brun rapide"),
        ],
        SCHEMA,
    )
    cm = {(r["actual"], r["predicted"]): r["n_docs"]
          for r in nb_confusion(train, test).collect()}
    assert cm == {("en", "en"): 2, ("fr", "fr"): 2}


def test_oov_document_falls_back_to_prior(spark):
    """A doc with no in-vocab token gets the majority-prior label."""
    rows = [(i, "en", "alpha beta") for i in range(9)] + [(99, "fr", "gamma delta")]
    train = spark.createDataFrame(rows, SCHEMA)
    priors, likes = nb_train(train)
    test = spark.createDataFrame([(1, "??", "zzz qqq www")], SCHEMA)
    preds = nb_predict(test, priors, likes).collect()
    assert preds[0]["predicted"] == "en"  # 9:1 prior


def test_tie_breaks_to_smallest_label(spark):
    """Perfectly symmetric classes + an equidistant doc -> integer scores
    tie exactly; the smaller label must win deterministically."""
    train = spark.createDataFrame(
        [(1, "aa", "x y"), (2, "bb", "x y")], SCHEMA
    )
    priors, likes = nb_train(train)
    test = spark.createDataFrame([(7, "??", "x y")], SCHEMA)
    assert nb_predict(test, priors, likes).collect()[0]["predicted"] == "aa"


@pytest.mark.slow
def test_scores_invariant_under_repartitioning(spark):
    """Integer micro-nat scores make predictions independent of data
    layout — rerunning with a different partitioning must not flip any
    argmax (the exactness claim behind the oracle check)."""
    train = _train_docs(spark)
    test = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr",
          "the fox saute le dog" if i % 3 == 0 else "quick renard le the")
         for i in range(30)],
        SCHEMA,
    )
    priors, likes = nb_train(train)
    base = {r["doc_id"]: r["predicted"]
            for r in nb_predict(test, priors, likes).collect()}
    p2, l2 = nb_train(train.repartition(7))
    again = {r["doc_id"]: r["predicted"]
             for r in nb_predict(test.repartition(11), p2, l2).collect()}
    assert base == again


def test_nb_auc_known_values(spark):
    """AUC from the midrank statistic on constructed score tables:
    perfect separation -> 1.0, anti-separation -> 0.0, constant scores
    (all ties) -> 0.5 exactly."""
    from reddit_etl_pipeline_spark.operators.classify import nb_auc

    rows = []
    for i in range(10):
        rows.append((i, "perfect", i))           # positives (i>=5) higher
        rows.append((i, "inverted", -i))         # positives lower
        rows.append((i, "flat", 42))             # all tied
    scored = spark.createDataFrame(
        rows, "doc_id long, label string, score_unats long"
    )
    truth = spark.createDataFrame(
        [
            (i, "perfect" if i >= 5 else "x")
            for i in range(10)
        ],
        "doc_id long, actual string",
    )
    got = {r.label: r for r in nb_auc(scored, truth).collect()}
    # for labels 'inverted'/'flat' the same docs (i>=5 -> actual
    # 'perfect') are ALL negatives -> absent (n_pos = 0)
    assert set(got) == {"perfect"}
    assert got["perfect"].auc == 1.0

    truth2 = spark.createDataFrame(
        [(i, "inverted" if i >= 5 else "flat") for i in range(10)],
        "doc_id long, actual string",
    )
    got2 = {r.label: r for r in nb_auc(scored, truth2).collect()}
    assert got2["inverted"].auc == 0.0  # positives rank lowest by -i
    assert got2["flat"].auc == 0.5      # all ties -> exactly half
    assert (got2["flat"].n_pos, got2["flat"].n_neg) == (5, 5)


def test_nb_auc_separable_corpus_near_one(spark):
    """On the separable two-language corpus the per-language AUC must be
    ~1 (the classifier orders essentially all positives above
    negatives)."""
    from reddit_etl_pipeline_spark.operators.classify import (
        nb_auc,
        nb_scores,
        nb_train,
    )

    train = spark.createDataFrame(
        [(i, "en", "the cat sat on the mat") for i in range(20)]
        + [(i + 20, "de", "der hund ist nicht hier") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    test = spark.createDataFrame(
        [(100 + i, "en", "the dog sat on the cat") for i in range(10)]
        + [(110 + i, "de", "der kater ist hier nicht") for i in range(10)],
        "doc_id long, lang string, text string",
    )
    from pyspark.sql import functions as F

    priors, likes = nb_train(train, label_col="lang")
    scored = nb_scores(test, priors, likes)
    truth = test.select("doc_id", F.col("lang").alias("actual"))
    got = {r.label: r.auc for r in nb_auc(scored, truth).collect()}
    assert got["en"] >= 0.99 and got["de"] >= 0.99, got
