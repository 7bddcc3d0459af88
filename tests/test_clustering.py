"""Distributed Lloyd k-means: geometry and convergence properties.

The driver check for kmeans_cluster_stats is rows-only (numpy float
work isn't SQL-expressible), so these tests carry the correctness load:
assignments must be exact nearest-centroid, inertia must never increase
across iterations, and results must be partitioning-invariant to float
tolerance.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from reddit_etl_pipeline_spark.operators.clustering import (  # noqa: E402
    kmeans_assign,
    kmeans_cluster_stats,
    kmeans_fit,
)


def _blob_df(spark, n=300, dim=8, n_blobs=4, parts=4):
    """Deterministic well-separated blobs (no RNG seeds in the cluster:
    values derived from the row index)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_blobs, dim)) * 10.0
    rows = []
    for i in range(n):
        b = i % n_blobs
        v = centers[b] + rng.normal(size=dim) * 0.5
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def test_assignment_is_nearest_centroid(spark):
    df = _blob_df(spark)
    cents, _ = kmeans_fit(df, k=4, max_iter=5)
    got = {
        r.vec_id: (r.cluster, r.sqdist) for r in kmeans_assign(df, cents).collect()
    }
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    for vid, v in x.items():
        d2 = ((v - cents) ** 2).sum(axis=1)
        j = int(d2.argmin())
        assert got[vid][0] == j
        assert got[vid][1] == pytest.approx(float(d2[j]), rel=1e-9)


def test_inertia_monotone_nonincreasing(spark):
    df = _blob_df(spark)
    _, history = kmeans_fit(df, k=4, max_iter=8)
    assert len(history) >= 1
    for a, b in zip(history, history[1:]):
        assert b <= a * (1 + 1e-12)


def test_recovers_separated_blobs(spark):
    # 4 well-separated blobs, k=4: every cluster should be pure and the
    # per-cluster SSE far below the blob separation scale
    df = _blob_df(spark, n=200, n_blobs=4)
    cents, history = kmeans_fit(df, k=4, max_iter=10)
    assigned = {r.vec_id: r.cluster for r in kmeans_assign(df, cents).collect()}
    # purity: all members of one blob land in one cluster
    for b in range(4):
        labels = {assigned[i] for i in range(200) if i % 4 == b}
        assert len(labels) == 1, f"blob {b} split across {labels}"
    # and the 4 clusters are distinct
    assert len({assigned[i] for i in range(4)}) == 4


def test_partitioning_invariance(spark):
    df1 = _blob_df(spark, parts=2)
    df7 = _blob_df(spark, parts=7)
    c1, h1 = kmeans_fit(df1, k=4, max_iter=6)
    c7, h7 = kmeans_fit(df7, k=4, max_iter=6)
    assert np.allclose(c1, c7, rtol=1e-9, atol=1e-9)
    assert np.allclose(h1, h7, rtol=1e-9)


def test_more_clusters_than_distinct_points(spark):
    # k exceeds distinct vectors: extra centroids freeze at their seed,
    # no crash, every point still assigned to its nearest
    rows = [(i, [float(i % 2), 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = kmeans_fit(df, k=5, max_iter=3)
    assert len(cents) == 2  # only 2 distinct seed vectors exist
    out = kmeans_assign(df, cents).collect()
    assert len(out) == 10
    assert all(r.sqdist == pytest.approx(0.0, abs=1e-12) for r in out)


def test_cluster_stats_shape(spark):
    df = _blob_df(spark, n=120, n_blobs=4)
    stats = kmeans_cluster_stats(df, k=4, max_iter=6)
    rows = stats.collect()
    assert {c for r in rows for c in [r.cluster]} <= set(range(4))
    assert sum(r.n_points for r in rows) == 120
    assert all(r.avg_sqdist >= 0 for r in rows)


def test_cluster_stats_exact_partition_invariance(spark):
    """The integerized Lloyd loop is EXACTLY deterministic (integer sums
    are order-independent; the only float ops are correctly-rounded
    divisions of exact ints), so results must be bit-identical across
    partitionings — the property that makes the DuckDB oracle replay
    hash-match."""
    df = _blob_df(spark, n=120, n_blobs=4)
    a = sorted(tuple(r) for r in
               kmeans_cluster_stats(df.repartition(1), k=4, max_iter=6).collect())
    b = sorted(tuple(r) for r in
               kmeans_cluster_stats(df.repartition(11), k=4, max_iter=6).collect())
    assert a == b


def test_cluster_stats_recovers_blobs(spark):
    """Quantization at 1/1000 must not hurt clustering quality: the four
    well-separated blobs come out as four pure clusters."""
    df = _blob_df(spark, n=120, n_blobs=4)
    stats = sorted(r.n_points for r in
                   kmeans_cluster_stats(df, k=4, max_iter=10).collect())
    assert stats == [30, 30, 30, 30]


def test_silhouette_separated_blobs_high(spark):
    """Well-separated blobs: every cluster's average simplified
    silhouette should be strongly positive (near 1.0)."""
    from reddit_etl_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    df = _blob_df(spark, n=200, dim=8, n_blobs=4)
    rows = kmeans_silhouette(df, k=4, max_iter=8).collect()
    assert len(rows) == 4
    for r in rows:
        assert 800_000 <= r.avg_sil_micro <= 1_000_000
        assert -1_000_000 <= r.min_sil_micro <= r.max_sil_micro <= 1_000_000
        assert r.n_points > 0


def test_silhouette_bounds_and_total(spark):
    """Scores live in [-1e6, 1e6]; every point is scored exactly once."""
    from reddit_etl_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    df = _blob_df(spark, n=150, dim=6, n_blobs=3)
    rows = kmeans_silhouette(df, k=3, max_iter=5).collect()
    assert sum(r.n_points for r in rows) == 150
    for r in rows:
        assert -1_000_000 <= r.min_sil_micro <= r.max_sil_micro <= 1_000_000


def test_silhouette_requires_k_at_least_two(spark):
    from reddit_etl_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    df = _blob_df(spark, n=20, dim=4, n_blobs=2)
    with pytest.raises(ValueError):
        kmeans_silhouette(df, k=1)


def test_silhouette_point_on_two_centroids_scores_zero(spark):
    """Duplicate points split across two identical centroid locations:
    the both-zero guard yields s_micro = 0 instead of 0/0."""
    from reddit_etl_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    # two distinct values only: with k=2 each becomes its own centroid
    # and every point sits exactly ON its centroid (a=0, b>0), so every
    # score is exactly +1.0 — pinning the a=0 branch of the division
    rows = []
    for i in range(10):
        v = [0.0, 0.0] if i % 2 == 0 else [8.0, 8.0]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for r in kmeans_silhouette(df, k=2, max_iter=3).collect():
        assert r.avg_sil_micro == 1_000_000
        assert r.min_sil_micro == 1_000_000


def test_silhouette_headroom_pins():
    """Pin the documented overflow bounds (kmeans_silhouette docstring):
    the int64 assignment statistic A = sum_d (n*q - s)^2 and the
    DECIMAL(38) silhouette terms A*n^2*1e6 must fit at the driver
    geometry (sf0.1 embeddings: 128k rows, dim 64, |x| <= 0.6,
    scale=1000) — and the scale=100 lever must restore headroom at 10x
    (1.28M rows), which is what DEPLOYMENT.md's 10x row runs."""
    INT64 = 2**63
    DEC38 = 10**38

    def a_bound(n_rows, dim, xmax, scale):
        q = scale * xmax
        return dim * (2 * n_rows * q) ** 2

    # driver geometry (scale=1000)
    a1 = a_bound(128_000, 64, 0.6, 1000)
    assert a1 < INT64
    assert a1 * 128_000**2 * 10**6 < DEC38
    # 10x at scale=1000 would overflow int64 -> the lever is real
    assert a_bound(1_280_000, 64, 0.6, 1000) > INT64
    # ... and scale=100 restores it
    a10 = a_bound(1_280_000, 64, 0.6, 100)
    assert a10 < INT64
    assert a10 * 1_280_000**2 * 10**6 < DEC38


def test_lloyd_runtime_headroom_guard_raises(spark):
    """The integer kernel must REFUSE to run past the measured int64
    bound instead of silently wrapping numpy int64 (round-9 ADVICE): an
    absurd quantization scale pushes dim*(2*n*qmax)^2 past 2^63 on a
    tiny frame."""
    from reddit_etl_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    df = _blob_df(spark, n=200, dim=8)
    with pytest.raises(ValueError, match="headroom"):
        kmeans_cluster_stats(df, k=4, max_iter=1, scale=10**9)
    with pytest.raises(ValueError, match="headroom"):
        kmeans_silhouette(df, k=4, max_iter=1, scale=10**9)


def test_lloyd_runtime_headroom_guard_passes_in_bounds(spark):
    """Same frame at the default scale: well inside the measured bound,
    the guard must not fire."""
    assert kmeans_cluster_stats(_blob_df(spark, n=200, dim=8), k=4,
                                max_iter=1).count() > 0
