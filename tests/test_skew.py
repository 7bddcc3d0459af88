"""Skew utilities must produce results identical to their plain
equivalents (salting is a physical rewrite, not a semantic one)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import skew  # noqa: E402


def test_salted_join_matches_plain_join(spark):
    # heavily skewed: 90% of left rows share key 1
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    got = sorted(
        (r.k, r.payload, r.rv)
        for r in skew.salted_join(left, right, "k", n_salts=4).collect()
    )
    want = sorted((r.k, r.payload, r.rv) for r in left.join(right, "k").collect())
    assert got == want


def test_two_phase_count_matches_groupby(spark, events):
    got = {
        r.event_type: r.n
        for r in skew.two_phase_count(events, ["event_type"]).collect()
    }
    want = {
        r.event_type: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    assert got == want


def test_two_phase_distinct_count_matches(spark, events):
    got = {
        r.event_type: r.n_distinct
        for r in skew.two_phase_distinct_count(
            events, ["event_type"], "user_id"
        ).collect()
    }
    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_cosine_topk_lsh_recall(spark, embeddings):
    """LSH top-k must recover a decent fraction of the exact top-k
    (sanity floor — recall tuning is n_planes/n_tables)."""
    from reddit_etl_pipeline_spark.operators import similarity as S
    from pyspark.sql import functions as F

    q = embeddings.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_lsh(embeddings, q, dim=64, k=5).collect()
    }
    assert len(approx & exact) >= len(exact) * 0.3


def test_cosine_topk_pq_recall(spark, embeddings):
    """PQ asymmetric-distance top-k must recover most of the exact top-k
    even on random vectors (the quantization-hostile case); measured 0.8
    mean recall@5 at m=16/rerank=32 — floor set with slack."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators import similarity as S

    q = embeddings.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_topk(embeddings, q, k=5).collect()
    }
    assert len(approx & exact) >= len(exact) * 0.5


def test_pq_encode_shape_and_determinism(spark, embeddings):
    """Codes are m int codes in [0, n_codes) per vector; same session,
    same data -> identical codes (deterministic sample + init)."""
    from reddit_etl_pipeline_spark.operators import similarity as S

    books = S.train_pq_codebooks(embeddings, m=16, n_codes=16)
    assert books.shape == (16, 16, 4)
    a = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(embeddings, books).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(embeddings, books).collect()}
    assert a == b
    assert all(len(v) == 16 and all(0 <= c < 16 for c in v) for v in a.values())


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    left = spark.range(3).select(F.col("id").alias("k"))
    right = spark.range(3).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError):
        skew.salted_join(left, right, "k", how="full")


def test_cosine_topk_ivf_recall(spark, embeddings):
    from reddit_etl_pipeline_spark.operators import similarity as S

    q = embeddings.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(embeddings, q, k=5, n_centroids=8, nprobe=4).collect()
    }
    assert len(approx & exact) >= len(exact) * 0.3


def test_ivf_empty_corpus_raises(spark):
    import pytest as _pytest

    from reddit_etl_pipeline_spark.operators import similarity as S

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        S.train_ivf_grid_centroids(empty)


def test_embedding_neardup_exact_gated_beyond_max_rows(spark):
    from pyspark.sql import functions as F

    import pytest

    from reddit_etl_pipeline_spark.operators.similarity import (
        embedding_neardup_exact,
    )

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        embedding_neardup_exact(df, max_rows=10)
    # opt-in still works
    assert embedding_neardup_exact(df.limit(5), max_rows=None).count() == 10


def test_cosine_topk_ivfpq_recall_and_subset_of_probed_lists(spark, embeddings):
    """IVF-PQ composition: candidates only from probed lists scanned as
    codes; recall floor vs exact on random vectors (nprobe=4 of 8 lists
    + PQ rerank, the quantization-hostile case), and its results must be
    a subset of plain IVF's candidate space at the same nprobe (PQ only
    prunes within lists, never adds)."""
    from reddit_etl_pipeline_spark.operators import similarity as S

    q = embeddings.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(embeddings, q, k=5).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_pq_topk(
            embeddings, q, k=5, n_centroids=8, nprobe=4, rerank=64
        ).collect()
    }
    assert len(ivfpq & exact) >= len(exact) * 0.4, len(ivfpq & exact) / len(exact)
    # every query still returns k rows
    from collections import Counter

    per_q = Counter(qid for qid, _ in ivfpq)
    assert all(v == 5 for v in per_q.values()), per_q


def test_pq_query_collect_gated(spark, embeddings):
    """pq_topk / ivf_pq_topk collect the query side to build per-query
    LUTs; past max_queries they must refuse with a clear error instead of
    OOMing the driver (knn_label_confusion's exact-path contract)."""
    import pytest

    from reddit_etl_pipeline_spark.operators import similarity as S

    q = embeddings.filter(F.col("vec_id") < 20)
    with pytest.raises(ValueError, match="max_queries"):
        S.pq_topk(embeddings, q, k=3, max_queries=10)
    with pytest.raises(ValueError, match="max_queries"):
        S.ivf_pq_topk(embeddings, q, k=3, max_queries=10)
    # opt-out and under-gate paths still work
    assert S.pq_topk(embeddings, q.limit(3), k=3, max_queries=10).count() == 9
    assert (
        S.pq_topk(embeddings, q.limit(3), k=3, max_queries=None).count() == 9
    )


def test_ivfpq_partition_independent(spark, embeddings):
    """The rerank candidate cut is a GLOBAL top-rerank per query under a
    total (-approx, neighbor_id) order, so results must not change with
    corpus partitioning / Arrow batch boundaries."""
    from reddit_etl_pipeline_spark.operators import similarity as S

    q = embeddings.filter(F.col("vec_id") < 5)
    kw = dict(k=5, n_centroids=8, nprobe=4, rerank=16)
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ivf_pq_topk(embeddings.repartition(1), q, **kw).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.ivf_pq_topk(
            embeddings.repartition(13, "vec_id"), q, **kw
        ).collect()
    )
    assert a == b
    c = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.pq_topk(embeddings.repartition(1), q, k=5, rerank=16).collect()
    )
    d = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.pq_topk(
            embeddings.repartition(13, "vec_id"), q, k=5, rerank=16
        ).collect()
    )
    assert c == d
