"""BM25 retrieval (operators/retrieval.py): integer-exactness contract,
ranking sanity, guards, and the overflow headroom pins."""

import math

import pytest

from reddit_etl_pipeline_spark.operators import retrieval as RV


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, text string")


def test_self_retrieval_top1(spark):
    """On a corpus of lexically distinct documents, querying with a
    document's own text must rank that document first."""
    corpus = [
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
        (3, "iota kappa lambda mu"),
        (4, "nu xi omicron pi rho"),
    ]
    docs = _docs(spark, corpus)
    qs = _queries(spark, [(1, corpus[0][1]), (3, corpus[2][1])])
    got = {
        r.query_id: r.doc_id
        for r in RV.bm25_topk(docs, qs, k=1, prune_stop_terms=False).collect()
    }
    assert got == {1: 1, 3: 3}


def test_tf_monotonicity_same_length(spark):
    """Two docs of equal length; the one repeating the query term scores
    strictly higher."""
    docs = _docs(
        spark,
        [
            (1, "apple apple pear plum"),
            (2, "apple pear plum grape"),
            (3, "cherry fig date olive"),
        ],
    )
    qs = _queries(spark, [(9, "apple")])
    rows = {
        r.doc_id: (r.score_micro, r.rank)
        for r in RV.bm25_topk(docs, qs, prune_stop_terms=False).collect()
    }
    assert 3 not in rows  # no query term -> not a candidate
    assert rows[1][0] > rows[2][0]
    assert rows[1][1] == 1 and rows[2][1] == 2


def test_matches_pure_python_reference(spark):
    """The exact integer formula replayed in pure Python — any drift in
    the Spark expression (scales, div order, tf cap) fails this."""
    corpus = [
        (10, "red green blue red"),
        (11, "green blue yellow"),
        (12, "red red red purple"),
        (13, "cyan magenta"),
    ]
    docs = _docs(spark, corpus)
    qs = _queries(spark, [(5, "red yellow")])
    got = {
        (r.query_id, r.doc_id): r.score_micro
        for r in RV.bm25_topk(docs, qs, k=10, prune_stop_terms=False).collect()
    }

    # pure-python replay
    n = len(corpus)
    tf = {}
    for did, text in corpus:
        for t in text.lower().split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    dl = {}
    for (did, _t), c in tf.items():
        dl[did] = dl.get(did, 0) + c
    total = sum(dl.values())
    avgdl_micro = (total * RV.MICRO) // n
    dfreq = {}
    for (_did, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for (did, t), c in tf.items():
        if t not in ("red", "yellow"):
            continue
        idf_micro = round(
            math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0) * RV.MICRO
        )
        c = min(c, RV.TF_CAP)
        r_micro = (dl[did] * 10**12) // avgdl_micro
        w = (idf_micro * RV.NUM_SCALE * c) // (
            RV.DEN_TF * c + RV.DEN_CONST + RV.DEN_R * r_micro
        )
        want[(5, did)] = want.get((5, did), 0) + w
    assert got == want


def test_stop_term_pruning(spark):
    """With pruning on, a term present in > half the corpus never reaches
    the posting join; with pruning off it scores."""
    docs = _docs(
        spark,
        [
            (1, "common rare1"),
            (2, "common rare2"),
            (3, "common rare3"),
            (4, "distinct1 distinct2"),
        ],
    )
    qs = _queries(spark, [(7, "common")])
    assert RV.bm25_topk(docs, qs, prune_stop_terms=True).count() == 0
    assert RV.bm25_topk(docs, qs, prune_stop_terms=False).count() == 3


def test_empty_and_null_guards(spark):
    empty = _docs(spark, [])
    qs = _queries(spark, [(1, "anything")])
    out = RV.bm25_topk(empty, qs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "doc_id", "score_micro", "rank",
    ]
    # all-NULL / blank texts: n_docs > 0 but zero tokens -> empty result
    nulls = _docs(spark, [(1, None), (2, "   ")])
    assert RV.bm25_topk(nulls, qs).count() == 0


def test_dl_bound_raises(spark, monkeypatch):
    monkeypatch.setattr(RV, "DL_MAX", 3)
    docs = _docs(spark, [(1, "a b c d e")])
    qs = _queries(spark, [(1, "a")])
    with pytest.raises(ValueError, match="tokens"):
        RV.bm25_topk(docs, qs)


def test_overflow_headroom_pins():
    """The docstring's 2^63 headroom claims, as executable pins — bump
    these deliberately if a scale constant changes."""
    # idf_micro for the smallest possible df (1) in a 1e9-doc corpus
    idf_max = round(math.log((1e9 - 1 + 0.5) / 1.5 + 1.0) * RV.MICRO)
    assert idf_max * RV.NUM_SCALE * RV.TF_CAP < 2**63
    # r_micro numerator at the dl guard
    assert RV.DL_MAX * 10**12 < 2**63
    # per-(query,doc) score sum: 1e5 distinct query terms each at the
    # max per-term weight (idf_max * (k1+1)) stays far under 2^63
    assert 10**5 * (idf_max * RV.NUM_SCALE // RV.DEN_TF) < 2**63


def test_streamed_index_equals_batch(spark, sf_dir):
    """The streaming posting-index build must produce EXACTLY the batch
    bm25_doc_search frame: per-batch tf partials over disjoint doc
    ranges union into the one-batch tf table, and the scorer is shared
    (retrieval.bm25_score_tf) — so any divergence is a merge-law bug."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.plans.star import load
    from reddit_etl_pipeline_spark.streaming import stream as ST

    got = sorted(
        tuple(r)
        for r in ST.streamed_bm25_doc_search(spark, sf_dir).collect()
    )
    docs = load(spark, sf_dir, "documents")
    qdocs = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    want = sorted(
        tuple(r)
        for r in RV.bm25_topk(
            docs, qdocs, k=10, prune_stop_terms=False
        ).collect()
    )
    assert got == want and got


def test_rrf_fuse_hand_computed(spark):
    """RRF on two tiny ranked lists vs hand arithmetic: shared candidate
    sums both systems' points; single-list candidates keep one term;
    ties break on doc_id."""
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank long",
    )
    got = {
        r.doc_id: (r.rrf_micro, r.rank)
        for r in RV.rrf_fuse(lex, sem, k=10).collect()
    }
    p = lambda r: 1000000 // (60 + r)  # noqa: E731
    want_scores = {
        10: p(1),
        11: p(2) + p(1),
        12: p(3),
        13: p(2),
    }
    order = sorted(want_scores, key=lambda d: (-want_scores[d], d))
    assert got == {
        d: (want_scores[d], i + 1) for i, d in enumerate(order)
    }
