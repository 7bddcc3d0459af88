

import pytest

def test_incremental_dedup_cross_and_within_batch(spark):
    """Batch docs already in the corpus are dropped; within-batch dups
    collapse to the lowest id; normalization (case/whitespace) applies
    across the batch boundary."""
    from reddit_etl_pipeline_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma  delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (11, "ALPHA   beta"),   # dup of corpus 1 after normalization
            (12, "epsilon zeta"),   # new
            (13, "epsilon  ZETA"),  # within-batch dup of 12
            (14, "eta theta"),      # new
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup(batch, corpus).collect()
    )
    assert kept == [12, 14]


def test_incremental_dedup_empty_batch_and_empty_corpus(spark):
    from reddit_etl_pipeline_spark.operators.dedup import incremental_dedup

    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    empty = docs.limit(0)
    assert incremental_dedup(empty, docs).count() == 0
    assert sorted(
        r["doc_id"] for r in incremental_dedup(docs, empty).collect()
    ) == [1, 2]


def test_incremental_dedup_null_text_never_matches(spark):
    """SQL equality semantics: NULL-text docs are not duplicates of each
    other across the batch boundary (the oracle's NOT EXISTS never
    matches NULL); within the batch they still collapse to one row, the
    same way GROUP BY groups NULLs."""
    from reddit_etl_pipeline_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, None), (2, "alpha")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(11, None), (12, None), (13, "alpha"), (14, "beta")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup(batch, corpus).collect()
    )
    assert kept == [11, 14]  # null survives (one row); alpha is a corpus dup


def test_neardup_canonical_keeps_best_quality(spark):
    from reddit_etl_pipeline_spark.operators.dedup import neardup_canonical

    # docs 0/1/2 are near-identical (one cluster); doc 1 has the longest,
    # most alphabetic text -> highest quality -> canonical despite not
    # being the lowest id. Doc 5 is a singleton; doc 6 has NULL text.
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [
            (0, base + "!!!! ###"),
            (1, base + "plus clean prose"),
            (2, base + "???? @@@"),
            (5, "completely different text about spark engines"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in neardup_canonical(docs, threshold=0.5).collect()}
    assert out[0].canonical_id == out[1].canonical_id == out[2].canonical_id == 1
    assert out[5].canonical_id == 5
    assert out[6].canonical_id == 6 and out[6].quality == -1.0


def test_neardup_canonical_single_cluster_pass(spark):
    """The member checkpoint must pin ONE execution of the
    jaccard+connected-components lineage: the returned plan may only
    reference the checkpointed RDD (ExistingRDD), never the source
    relation — if the checkpoint regressed, the source scan (and the
    whole cluster pass) would appear twice."""
    from reddit_etl_pipeline_spark.operators.dedup import neardup_canonical

    docs = spark.createDataFrame(
        [(i, f"doc number {i} body text") for i in range(20)],
        "doc_id long, text string",
    )
    out = neardup_canonical(docs, threshold=0.9)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan, plan
    # LocalRelation/LogicalRDD of the INPUT docs must not appear: every
    # branch of the final join reads the checkpointed member table
    assert "LocalRelation" not in plan and "LocalTableScan" not in plan, plan


@pytest.mark.slow
def test_neardup_canonical_minhash_matches_exact_on_true_dups(spark):
    """On unmistakable near-duplicates (copies with tiny edits) the
    minhash scale path must collapse the same clusters and pick the same
    canonicals as the exact PPJoin path (the cross-mode contract the
    curate CLI relies on)."""
    from reddit_etl_pipeline_spark.operators.dedup import neardup_canonical

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (0, base + "!!!! ###"),
            (1, base + "plus clean prose"),
            (2, base + "???? @@@"),
            (5, "completely different text about spark engines at scale"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    exact = {
        r.doc_id: r.canonical_id
        for r in neardup_canonical(docs, threshold=0.5, method="exact").collect()
    }
    mh = {
        r.doc_id: r.canonical_id
        for r in neardup_canonical(docs, threshold=0.5, method="minhash").collect()
    }
    assert mh == exact
    assert mh[0] == mh[1] == mh[2] == 1 and mh[5] == 5 and mh[6] == 6
