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
