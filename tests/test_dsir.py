"""DSIR importance-resampling selection (operators/dsir.py): weight
math against hand-computed log ratios, selection separability, empty-doc
and OOV behavior, partition invariance, and the hashed-feature
production mode (bounded model, selection agreement)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators import dsir

MICRO = dsir.MICRO


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [Row(doc_id=start_id + i, text=t) for i, t in enumerate(texts)]
    )


def test_fit_matches_hand_computed_ratio(spark):
    # target "a b" -> feats {a, b, "a b"}; raw "a c" -> {a, c, "a c"}
    # union V = 5, N_t = 3, N_r = 3
    w = {
        r["feat"]: r["w_unats"]
        for r in dsir.dsir_fit(
            _docs(spark, ["a b"]), _docs(spark, ["a c"])
        ).collect()
    }
    assert set(w) == {"a", "b", "a b", "c", "a c"}
    # shared feature: ln((1+1)/8) - ln((1+1)/8) = 0
    assert w["a"] == 0
    # target-only: ln(2/8) - ln(1/8) = ln 2; raw-only: -ln 2
    assert w["b"] == round(math.log(2.0 / 8) * MICRO - math.log(1.0 / 8) * MICRO)
    assert w["c"] == -w["b"]


def test_score_sums_occurrences_and_handles_empty(spark):
    weights = dsir.dsir_fit(_docs(spark, ["a b"]), _docs(spark, ["a c"]))
    scored = dsir.dsir_score(
        _docs(spark, ["b b", "", "zz unseen"]), weights
    )
    rows = {r["doc_id"]: r for r in scored.collect()}
    ln2 = round(math.log(2.0 / 8) * MICRO - math.log(1.0 / 8) * MICRO)
    # "b b": feats b, b, "b b"(unseen->0) = 2*ln2
    assert rows[0]["w_unats"] == 2 * ln2
    assert rows[0]["n_feats"] == 3
    # empty doc: no features, weight 0 (still present)
    assert rows[1]["n_feats"] == 0 and rows[1]["w_unats"] == 0
    # fully OOV doc: features exist but weigh 0
    assert rows[2]["n_feats"] == 3 and rows[2]["w_unats"] == 0


def test_select_prefers_target_like_docs(spark):
    target = _docs(spark, ["the cat sat on the mat"] * 5)
    raw = _docs(
        spark,
        ["the cat sat down", "zq xv pw qq", "the mat sat flat", "aa bb cc dd"],
        start_id=100,
    )
    top2 = dsir.dsir_select(target, raw, k=2).collect()
    assert {r["doc_id"] for r in top2} == {100, 102}
    # ordered by weight desc
    assert top2[0]["w_unats"] >= top2[1]["w_unats"]


def test_partition_invariance(spark, documents):
    docs = documents.limit(200)
    tgt = docs.filter(F.col("doc_id") % 2 == 0)
    raw = docs.filter(F.col("doc_id") % 2 == 1)
    a = dsir.dsir_select(tgt, raw, k=20).collect()
    b = dsir.dsir_select(
        tgt.repartition(7), raw.repartition(13), k=20
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_hashed_mode_bounds_model_and_agrees_on_separable_corpus(spark):
    target = _docs(spark, ["alpha beta gamma delta"] * 10)
    raw = _docs(
        spark,
        ["alpha beta gamma", "zz yy xx ww", "beta gamma delta", "qq rr ss tt"],
        start_id=50,
    )
    weights = dsir.dsir_fit(target, raw, n_buckets=64)
    assert weights.count() <= 64  # model capped regardless of vocab
    top2 = dsir.dsir_select(target, raw, k=2, n_buckets=64)
    assert {r["doc_id"] for r in top2.collect()} == {50, 52}


def test_select_plan_is_take_ordered(spark, documents):
    docs = documents.limit(100)
    plan = dsir.dsir_select(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        k=10,
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fit_on_empty_corpora_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="any features"):
        dsir.dsir_fit(_docs(spark, ["", "  "]), _docs(spark, [""]))
