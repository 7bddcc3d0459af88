"""PageRank / degree properties (operators/graph.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from reddit_etl_pipeline_spark.operators.graph import (  # noqa: E402
    clustering_coefficients,
    degree_stats,
    kcore_members,
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


def test_kcore_triangle_with_pendant(spark):
    """Triangle + pendant, k=2: the pendant (degree 1) peels, the
    triangle survives with core_deg 2 each."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {
        r.node: r.core_deg
        for r in kcore_members(_edges(spark, edges), k=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel_matches_python(spark):
    """A chain hanging off a K4 needs one peel round per chain node —
    exercises multi-round convergence; compared against a pure-python
    peel of the same graph."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = k4 + chain

    # python reference peel
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = [n for n, nb in adj.items() if len(nb) < 2]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(nb) for n, nb in adj.items()}

    got = {
        r.node: r.core_deg
        for r in kcore_members(_edges(spark, edges), k=2).collect()
    }
    assert got == want == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_core_and_duplicate_edges(spark):
    """k above the max degree empties the core; duplicate/reversed edges
    normalize away first."""
    edges = [(1, 2), (2, 1), (1, 2), (2, 3)]
    assert kcore_members(_edges(spark, edges), k=3).count() == 0
    got = {
        r.node: r.core_deg
        for r in kcore_members(_edges(spark, edges), k=1).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}


def test_kcore_converges_exactly_at_bound(spark):
    """Peel depth == max_rounds must SUCCEED (the extra round only
    confirms the fixpoint): a 6-node path with k=2 peels in exactly 3
    rounds to an empty core."""
    path = [(i, i + 1) for i in range(1, 6)]
    assert kcore_members(_edges(spark, path), k=2, max_rounds=3).count() == 0
    with pytest.raises(ValueError, match="fixpoint"):
        # depth 3 > bound 2: the confirming round still shrinks
        kcore_members(_edges(spark, path), k=2, max_rounds=2)


def test_kcore_raises_past_round_bound(spark):
    """A path peels only its two ends per round, so a 10-node path with
    max_rounds=2 must raise loudly instead of silently stopping early
    (the oracle unrolls the same bound)."""
    path = [(i, i + 1) for i in range(1, 10)]
    with pytest.raises(ValueError, match="fixpoint"):
        kcore_members(_edges(spark, path), k=2, max_rounds=2)


def test_clustering_coefficients_known_values(spark):
    """Triangle nodes: coeff 1.0. Star center: 0 (no closed wedge).
    Triangle + pendant on node 3: deg 3, one triangle ->
    2/(3*2) = 0.333333."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {
        r.node: (r.degree, r.n_triangles, r.coeff)
        for r in clustering_coefficients(_edges(spark, edges)).collect()
    }
    assert got == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (3, 1, round(2 / 6, 6)),
        4: (1, 0, 0.0),
    }
    star = [(0, i) for i in range(1, 6)]
    got = {
        r.node: r.coeff
        for r in clustering_coefficients(_edges(spark, star)).collect()
    }
    assert got == {i: 0.0 for i in range(6)}


def test_triangle_estimate_p1_equals_exact(spark):
    """num == den keeps every edge, so the 'estimate' must equal the
    exact global triangle count on any graph (here: two triangles
    sharing an edge + a pendant, duplicate + reversed edges thrown in)."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators.graph import (
        triangle_counts,
        triangle_estimate,
    )

    pairs = [
        (1, 2), (2, 3), (1, 3),          # triangle A
        (2, 4), (3, 4),                  # triangle B shares edge (2,3)
        (4, 5),                          # pendant
        (2, 1), (3, 2), (1, 2),          # dup/reversed noise
    ]
    e = _edges(spark, pairs)
    row = triangle_estimate(e, sample_num=1, sample_den=1).collect()[0]
    exact = (
        triangle_counts(_edges(spark, pairs))
        .agg((F.sum("n_triangles") / 3).cast("long"))
        .collect()[0][0]
    )
    assert row.sampled_triangles == row.est_triangles == exact == 2
    assert row.n_edges == row.n_sampled_edges == 6


def test_triangle_estimate_accuracy_on_corpus(spark, sf_dir):
    """DOULION at p=1/4 on the sf co-purchase graph: deterministic
    sampling -> the estimate is reproducible, so pin a tight relative
    error vs the exact count (measured 1.1% at sf0.01; allow 10% for
    other sf dirs) plus the structural invariants."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from reddit_etl_pipeline_spark.operators.graph import (
        triangle_counts,
        triangle_estimate,
    )

    row = triangle_estimate(
        E._copurchase_edges(spark, sf_dir), sample_num=1, sample_den=4
    ).collect()[0]
    exact = (
        triangle_counts(E._copurchase_edges(spark, sf_dir))
        .agg((F.sum("n_triangles") / 3).cast("long"))
        .collect()[0][0]
    )
    assert row.est_triangles == row.sampled_triangles * 64
    # sampled edge fraction concentrates around 1/4
    frac = row.n_sampled_edges / row.n_edges
    assert 0.2 < frac < 0.3, frac
    assert abs(row.est_triangles - exact) <= 0.10 * exact, (
        row.est_triangles,
        exact,
    )


def test_triangle_estimate_oracle_handles_negative_keys(spark):
    """The DuckDB replay must reinterpret NEGATIVE node ids through the
    shared two's-complement reinterpret instead of erroring on a raw
    UBIGINT cast (round-7 advice) — engine and oracle must agree on a
    graph with negative BIGINT keys."""
    import duckdb

    from reddit_etl_pipeline_spark.operators.graph import (
        triangle_estimate,
        triangle_estimate_oracle_sql,
    )

    pairs = [(-5, -2), (-2, 7), (-5, 7), (-9, -5), (-9, -2), (3, 7)]
    e = _edges(spark, pairs)
    got = sorted(
        map(
            tuple,
            triangle_estimate(e, sample_num=1, sample_den=2).collect(),
        )
    )
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    ctes = (
        f"raw(u, v) AS MATERIALIZED (SELECT * FROM (VALUES {values})),\n"
        "e AS MATERIALIZED (SELECT DISTINCT least(u, v) AS lo, "
        "greatest(u, v) AS hi FROM raw)"
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                triangle_estimate_oracle_sql(ctes, 1, 2)
            ).fetchall(),
        )
    )
    assert got == want


def test_triangle_estimate_rejects_bad_params(spark):
    from reddit_etl_pipeline_spark.operators.graph import triangle_estimate

    e = _edges(spark, [(1, 2)])
    for num, den in ((1, 3), (0, 4), (5, 4)):
        with pytest.raises(ValueError):
            triangle_estimate(e, sample_num=num, sample_den=den)


def test_lpa_two_cliques_split(spark):
    """Two 4-cliques bridged by one edge: each clique converges to its
    min member id; the bridge does not merge them in 4 rounds (the
    closed-neighborhood majority inside a clique beats one cross vote)."""
    from reddit_etl_pipeline_spark.operators.graph import label_propagation

    cl1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    e = _edges(spark, cl1 + cl2 + [(4, 10)])
    got = {r.node: r.community for r in label_propagation(e, rounds=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_lpa_matches_python_reference(spark):
    """Synchronous closed-neighborhood LPA with (cnt DESC, label ASC)
    argmax, replayed in plain python on an irregular graph (two dense
    blobs + a path tail + an isolated edge), per round."""
    from collections import Counter

    from reddit_etl_pipeline_spark.operators.graph import label_propagation

    pairs = [
        (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6),  # blob+path
        (7, 8), (7, 9), (8, 9), (9, 10),                  # blob+pendant
        (20, 21),                                          # isolated edge
        (2, 1), (3, 1),                                    # dup noise
    ]
    rounds = 4
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e_ in und for n in e_})
    adj = {n: {n} for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            c = Counter(lab[m] for m in adj[n])
            new[n] = min(c, key=lambda v: (-c[v], v))
        lab = new

    got = {
        r.node: r.community
        for r in label_propagation(
            _edges(spark, pairs), rounds=rounds
        ).collect()
    }
    assert got == lab


def test_lpa_oracle_replay_matches(spark):
    """lpa_oracle_sql must replay the engine bit-for-bit on an
    oscillation-prone shape (even cycle — the classic synchronous LPA
    failure mode the self-vote damps)."""
    import duckdb

    from reddit_etl_pipeline_spark.operators.graph import (
        label_propagation,
        lpa_oracle_sql,
    )

    pairs = [(i, (i % 8) + 1) for i in range(1, 9)]  # 8-cycle
    got = {
        r.node: r.community
        for r in label_propagation(_edges(spark, pairs), rounds=5).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", pairs)
    sql = lpa_oracle_sql(
        "e AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS lo, "
        "greatest(src,dst) AS hi FROM edges WHERE src <> dst)",
        rounds=5,
    )
    want = dict(con.execute(sql).fetchall())
    con.close()
    assert got == want and len(got) == 8


def test_seed_distances_path_graph(spark):
    """Path 1-2-3-4-5-6 with seed {1}: dist = hops along the path,
    capped at max_hops; beyond-horizon nodes absent. An isolated seed
    appears at 0."""
    from reddit_etl_pipeline_spark.operators.graph import seed_distances

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r.node: r.dist
        for r in seed_distances(e, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 99: 0, 2: 1, 3: 2, 4: 3}


def test_seed_distances_multi_source_min(spark):
    """Two seeds at both ends of a path: every node gets the NEAREST
    seed's distance (min-plus), and the oracle replays it."""
    import duckdb

    from reddit_etl_pipeline_spark.operators.graph import (
        bfs_oracle_sql,
        seed_distances,
    )

    pairs = [(i, i + 1) for i in range(1, 8)]  # path 1..8
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([(1,), (8,)], "node long")
    got = {
        r.node: r.dist
        for r in seed_distances(e, seeds, max_hops=4).collect()
    }
    assert got == {1: 0, 8: 0, 2: 1, 7: 1, 3: 2, 6: 2, 4: 3, 5: 3}

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", pairs)
    con.execute("CREATE TABLE s(node BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(1,), (8,)])
    sql = bfs_oracle_sql(
        "e AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS lo, "
        "greatest(src,dst) AS hi FROM edges WHERE src <> dst), "
        "seeds AS MATERIALIZED (SELECT node FROM s)",
        max_hops=4,
    )
    want = dict(con.execute(sql).fetchall())
    con.close()
    assert got == want


def test_modularity_two_cliques_known_value(spark):
    """Two disjoint triangles labeled as their own communities: m = 6,
    each community e_c = 3, d_c = 6 -> q_c = 3/6 - (6/12)^2 = 0.25
    exactly -> q_micro = 250000; Q = 0.5 (the maximum for two equal
    cliques with no inter-edges)."""
    from reddit_etl_pipeline_spark.operators.graph import (
        community_modularity,
        label_propagation,
    )

    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    e = _edges(spark, pairs)
    labels = label_propagation(e, rounds=3)
    rows = {
        r.community: r for r in community_modularity(e, labels).collect()
    }
    assert set(rows) == {1, 4}
    for c in (1, 4):
        assert rows[c].n_members == 3
        assert rows[c].intra_edges == 3
        assert rows[c].degree_sum == 6
        assert rows[c].q_micro == 250000


def test_modularity_single_community_is_zero(spark):
    """All nodes in one community: e_c = m, d_c = 2m -> q = 1 - 1 = 0."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators.graph import community_modularity

    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    e = _edges(spark, pairs)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("community", F.lit(1))
    )
    row = community_modularity(e, nodes).collect()[0]
    assert row.q_micro == 0 and row.intra_edges == 5 and row.degree_sum == 10


def test_modularity_matches_oracle_on_copurchase(spark, sf_dir):
    """Engine vs the composed DuckDB replay (LPA labels wrapped as a
    CTE) on the real co-purchase graph."""
    import duckdb

    import __spark_entry__ as E
    from reddit_etl_pipeline_spark.operators.graph import (
        community_modularity,
        label_propagation,
        modularity_oracle_sql,
    )

    edges = E._copurchase_edges(spark, sf_dir)
    labels = label_propagation(edges, rounds=4)
    got = sorted(map(tuple, community_modularity(edges, labels).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                modularity_oracle_sql(E._copurchase_ctes(), rounds=4)
            ).fetchall(),
        )
    )
    assert got == want


class TestLinkPrediction:
    def _lp(self, spark, pairs, **kw):
        from reddit_etl_pipeline_spark.operators.graph import link_prediction

        return link_prediction(_edges(spark, pairs), **kw).collect()

    def test_path_graph_exact(self, spark):
        # a-b-c: only non-adjacent pair (1,3), one common neighbor 2
        rows = self._lp(spark, [(1, 2), (2, 3)], sample_num=1, sample_den=1)
        assert len(rows) == 1
        r = rows[0]
        assert (r.part_a, r.part_b) == (1, 3)
        assert (r.cn_sampled, r.cn_est) == (1, 1)
        assert (r.deg_a, r.deg_b) == (1, 1)

    def test_square_diagonals(self, spark):
        # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4), each cn=2
        rows = self._lp(
            spark, [(1, 2), (2, 3), (3, 4), (4, 1)],
            sample_num=1, sample_den=1,
        )
        got = {(r.part_a, r.part_b): r.cn_sampled for r in rows}
        assert got == {(1, 3): 2, (2, 4): 2}
        for r in rows:
            assert r.deg_a == 2 and r.deg_b == 2

    def test_adjacent_pairs_never_appear(self, spark):
        # triangle + pendant: candidates exclude every existing edge
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        rows = self._lp(spark, pairs, sample_num=1, sample_den=1)
        edges = {(min(a, b), max(a, b)) for a, b in pairs}
        for r in rows:
            assert (r.part_a, r.part_b) not in edges
        got = {(r.part_a, r.part_b): r.cn_sampled for r in rows}
        assert got == {(1, 4): 1, (2, 4): 1}

    def test_sampled_counts_are_subset_and_scaled(self, spark):
        # K5 minus one edge: the missing edge (4,5) has cn=3 exactly.
        pairs = [
            (a, b)
            for a in range(1, 6)
            for b in range(a + 1, 6)
            if (a, b) != (4, 5)
        ]
        exact = {
            (r.part_a, r.part_b): r.cn_sampled
            for r in self._lp(spark, pairs, sample_num=1, sample_den=1)
        }
        assert exact == {(4, 5): 3}
        sampled = self._lp(spark, pairs, sample_num=1, sample_den=2)
        for r in sampled:
            key = (r.part_a, r.part_b)
            assert key in exact
            assert r.cn_sampled <= exact[key]
            assert r.cn_est == r.cn_sampled * 4  # den^2/num^2 = 4

    def test_bad_sampling_params_raise(self, spark):
        with pytest.raises(ValueError):
            self._lp(spark, [(1, 2)], sample_num=1, sample_den=3)
        with pytest.raises(ValueError):
            self._lp(spark, [(1, 2)], sample_num=0, sample_den=4)

    def test_total_order_and_limit(self, spark):
        # star: center 0 with leaves 1..6 -> every leaf pair shares 0
        pairs = [(0, i) for i in range(1, 7)]
        rows = self._lp(
            spark, pairs, sample_num=1, sample_den=1, top_n=5
        )
        assert len(rows) == 5
        keys = [(r.part_a, r.part_b) for r in rows]
        assert keys == sorted(keys)  # cn all equal -> (a, b) asc order

    def test_resource_allocation_hand_computed(self, spark):
        # path a-b-c at p=1: middle b has sampled degree 2
        rows = self._lp(spark, [(1, 2), (2, 3)], sample_num=1, sample_den=1)
        assert rows[0].ra_micro == 500_000
        # K5 minus (4,5): middles 1,2,3 each deg 4 -> ra = 3 * 250000
        pairs = [
            (a, b)
            for a in range(1, 6)
            for b in range(a + 1, 6)
            if (a, b) != (4, 5)
        ]
        rows = self._lp(spark, pairs, sample_num=1, sample_den=1)
        assert rows[0].ra_micro == 750_000
