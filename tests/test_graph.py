"""PageRank / degree properties (operators/graph.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from reddit_etl_pipeline_spark.operators.graph import (  # noqa: E402
    degree_stats,
    pagerank,
)


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(pairs, "src long, dst long").repartition(parts)


def test_rank_mass_conserved_with_dangling_redistribution(spark):
    # node 3 is dangling (no out-edges)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    ranks = {r.node: r.rank for r in pagerank(e, iters=12).collect()}
    assert sum(ranks.values()) == pytest.approx(3.0, rel=1e-6)


def test_star_graph_center_dominates(spark):
    # everyone points at node 0
    e = _edges(spark, [(i, 0) for i in range(1, 8)])
    ranks = {r.node: r.rank for r in pagerank(e, iters=10).collect()}
    assert ranks[0] == max(ranks.values())
    leaves = [ranks[i] for i in range(1, 8)]
    assert max(leaves) == pytest.approx(min(leaves), rel=1e-9)


def test_symmetric_cycle_is_uniform(spark):
    # 4-cycle: perfectly symmetric -> uniform ranks = 1.0
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks = [r.rank for r in pagerank(e, iters=15).collect()]
    for r in ranks:
        assert r == pytest.approx(1.0, rel=1e-9)


def test_partitioning_invariance(spark):
    pairs = [(i, (i * 7 + 3) % 20) for i in range(60)]
    r2 = {r.node: r.rank for r in pagerank(_edges(spark, pairs, 2), iters=8).collect()}
    r7 = {r.node: r.rank for r in pagerank(_edges(spark, pairs, 7), iters=8).collect()}
    assert set(r2) == set(r7)
    for n in r2:
        assert r2[n] == pytest.approx(r7[n], rel=1e-9)


def test_degree_stats(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    d = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(e).collect()}
    assert d == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_triangle_counts_known_graphs(spark):
    from reddit_etl_pipeline_spark.operators.graph import triangle_counts

    # K4: every node is in C(3,2)=3 triangles; 4 triangles total
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # triangle + pendant + disconnected edge: only the triangle counts
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (8, 9)]
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1}

    # duplicates / reversed direction / self-loops normalize away
    noisy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)]
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(noisy, "src long, dst long")
        ).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_hub_skew_matches_bruteforce(spark):
    """Star hub + random chords: degree orientation must still count
    exactly what the O(n^3) reference counts."""
    import itertools
    import random

    from reddit_etl_pipeline_spark.operators.graph import triangle_counts

    rnd = random.Random(7)
    n = 40
    edges = [(0, i) for i in range(1, n)]  # hub 0
    edges += [
        (a, b)
        for a, b in itertools.combinations(range(1, n), 2)
        if rnd.random() < 0.1
    ]
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == want
