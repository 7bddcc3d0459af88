"""k-NN embedding-label classification (similarity.knn_label_confusion):
separable-cluster exactness, nearest-neighbor tie-break, the broadcast
gate, and partition invariance."""

import pytest
from pyspark.sql import Row

from reddit_etl_pipeline_spark.operators.similarity import knn_label_confusion


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v, label=lb) for i, v, lb in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_separable_clusters_perfect_diagonal(spark):
    # two well-separated clusters; odd ids test, even ids train
    train = _vecs(spark, [
        (0, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (4, [1.0, 0.1], 0),
        (6, [0.0, 1.0], 1), (8, [0.1, 0.9], 1), (10, [0.1, 1.0], 1),
    ])
    test = _vecs(spark, [
        (1, [0.95, 0.05], 0), (3, [0.05, 0.95], 1), (5, [1.0, 0.05], 0),
    ])
    conf = {(r["actual"], r["predicted"]): r["n_vecs"]
            for r in knn_label_confusion(train, test, k=3).collect()}
    assert conf == {(0, 0): 2, (1, 1): 1}


def test_tie_breaks_to_nearest_neighbor_label(spark):
    # k=2: one vote each; the label of the NEARER neighbor must win
    train = _vecs(spark, [
        (0, [1.0, 0.0], 7),   # nearest to the query
        (2, [0.7, 0.7], 3),   # second
    ])
    test = _vecs(spark, [(1, [1.0, 0.01], 9)])
    rows = knn_label_confusion(train, test, k=2).collect()
    assert len(rows) == 1
    assert rows[0]["actual"] == 9 and rows[0]["predicted"] == 7


def test_max_queries_gate(spark):
    vs = _vecs(spark, [(i, [1.0, 0.0], 0) for i in range(10)])
    with pytest.raises(ValueError, match="max_queries"):
        knn_label_confusion(vs, vs, k=1, max_queries=5)


def test_partition_invariance(spark, embeddings):
    from pyspark.sql import functions as F

    train = embeddings.filter(F.col("vec_id") % 2 == 0)
    test = embeddings.filter(F.col("vec_id") % 2 == 1)
    a = sorted(map(tuple, knn_label_confusion(train, test).collect()))
    b = sorted(map(tuple, knn_label_confusion(
        train.repartition(7), test.repartition(5)).collect()))
    assert a == b


def test_ivf_method_matches_exact_on_separable_clusters(spark):
    train = _vecs(spark, [
        (i, [1.0 + 0.01 * i, 0.0], 0) for i in range(0, 40, 2)
    ] + [
        (i, [0.0, 1.0 + 0.01 * i], 1) for i in range(40, 80, 2)
    ])
    test = _vecs(spark, [(1, [0.98, 0.02], 0), (41, [0.02, 0.97], 1)])
    exact = sorted(map(tuple, knn_label_confusion(
        train, test, k=3, method="exact").collect()))
    ivf = sorted(map(tuple, knn_label_confusion(
        train, test, k=3, method="ivf", n_centroids=4, nprobe=2).collect()))
    assert ivf == exact == [(0, 0, 1), (1, 1, 1)]


def test_ivf_method_agrees_with_exact_on_real_embeddings(spark, embeddings):
    from pyspark.sql import functions as F

    train = embeddings.filter(F.col("vec_id") % 2 == 0)
    test = embeddings.filter(F.col("vec_id") % 2 == 1)
    n_test = test.count()
    exact = knn_label_confusion(train, test, k=5)
    ivf = knn_label_confusion(train, test, k=5, method="ivf")
    # both classify every test vector; per-class confusion agreement is
    # bounded below (IVF recall floor — random vectors are the hard case)
    assert sum(r["n_vecs"] for r in ivf.collect()) == n_test
    ex = {(r["actual"], r["predicted"]): r["n_vecs"] for r in exact.collect()}
    iv = {(r["actual"], r["predicted"]): r["n_vecs"] for r in ivf.collect()}
    overlap = sum(min(ex.get(k, 0), iv.get(k, 0)) for k in set(ex) | set(iv))
    assert overlap / n_test >= 0.3


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # train: (vec of small ints, label)
        st.tuples(
            st.lists(st.integers(min_value=0, max_value=3), min_size=3, max_size=3),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=2,
        max_size=8,
    ).filter(lambda vs: any(any(c != 0 for c in v) for v, _ in vs)),
    st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=3, max_size=3),
        min_size=1,
        max_size=4,
    ),
)
@pytest.mark.slow
def test_knn_matches_numpy_reference(spark, train_rows, test_vecs):
    """Random integer-component vectors (exact float64 dot products, so
    cross-implementation comparison is deterministic) against a pure
    numpy/python reference of the same top-k + vote + tie-break rules.
    Zero vectors exercise the norm guard."""
    import numpy as np

    k = 3
    train = _vecs(
        spark,
        [(2 * i, [float(c) for c in v], lb) for i, (v, lb) in enumerate(train_rows)],
    )
    test = _vecs(
        spark,
        [(2 * i + 1, [float(c) for c in v], 0) for i, v in enumerate(test_vecs)],
    )
    got = {
        (r["actual"], r["predicted"]): r["n_vecs"]
        for r in knn_label_confusion(train, test, k=k).collect()
    }

    # reference — rounds to RANK_DP like the engine (and its DuckDB
    # oracle): rank order below 1e-12 similarity difference is tie-broken
    # by neighbor_id, never by float summation-order noise
    def cos(a, b):
        na = float(np.sqrt(np.dot(a, a))) or 1e-12
        nb = float(np.sqrt(np.dot(b, b))) or 1e-12
        return round(float(np.dot(a, b)) / (na * nb), 12)

    conf = {}
    for qi, qv in enumerate(test_vecs):
        q = np.array(qv, dtype="float64")
        scored = sorted(
            (
                (-cos(q, np.array(v, dtype="float64")), 2 * ti, lb)
                for ti, (v, lb) in enumerate(train_rows)
            ),
        )[:k]
        votes = {}
        for rank, (_, nid, lb) in enumerate(scored, start=1):
            n, best = votes.get(lb, (0, 10**9))
            votes[lb] = (n + 1, min(best, rank))
        pred = min(votes.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0]))[0]
        key = (0, pred)
        conf[key] = conf.get(key, 0) + 1
    assert got == conf


def test_ann_recall_eval_scoreboard(spark, sf_dir):
    """Structural invariants of the ANN scoreboard: one row per method,
    hits bounded by n_queries*k, recall = hits/(n*k) to 6 dp, MRR in
    [0, 1e6], and PQ/IVF recalls at least as high as the recall floors
    the individual method tests pin."""
    import __spark_entry__ as E

    rows = {r.method: r for r in E.queries()["ann_recall_eval"](spark, sf_dir).collect()}
    assert set(rows) == {"ivf", "ivfpq", "lsh", "pq"}
    for m, r in rows.items():
        assert 0 <= r.hits <= r.n_queries * 5
        assert r.recall_at_5 == round(r.hits / (r.n_queries * 5.0), 6)
        assert 0 <= r.mrr_micro <= 1_000_000
        assert r.recall_at_5 >= 0.5, (m, r)  # every index beats chance by far


def test_ann_scoreboard_ndcg_bounds(spark, sf_dir):
    """nDCG@5 invariants: in [0, 1e6]; a method with perfect recall AND
    perfect order has ndcg == 1e6; ndcg <= recall-implied ceiling (all
    hits at the best ranks)."""
    import __spark_entry__ as E

    rows = {
        r.method: r
        for r in E.queries()["ann_recall_eval"](spark, sf_dir).collect()
    }
    disc = E._NDCG_DISC
    idcg = sum(disc)
    for m, r in rows.items():
        assert 0 <= r.ndcg_micro <= 1_000_000, (m, r)
        # ceiling: every hit at the top-|hits/q| ranks on average; a
        # coarse but real bound — perfect-recall methods must be near 1
        if r.recall_at_5 == 1.0:
            assert r.ndcg_micro >= 900_000, (m, r)
