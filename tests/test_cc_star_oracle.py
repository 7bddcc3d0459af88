"""The unrolled large-star/small-star connected-components oracle chain
(neardup_oracles.cc_star_member_ctes) vs direct Python union-find, on
adversarial graphs — shuffled paths (worst case for min propagation),
cliques, and random mixtures. No Spark needed."""

import random

import duckdb

from reddit_etl_pipeline_spark.neardup_oracles import cc_star_member_ctes


def _py_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _run_star(nodes, edges, rounds=34):
    if edges:
        pairs = "SELECT u AS doc_a, v AS doc_b FROM (VALUES " + ",".join(
            f"({min(a, b)},{max(a, b)})" for a, b in edges
        ) + ") t(u, v)"
    else:
        pairs = "SELECT 0 AS doc_a, 0 AS doc_b WHERE 1 = 0"
    nodes_sql = ",".join(f"({n})" for n in nodes)
    sql = f"""
WITH pairs AS MATERIALIZED ({pairs}),
{cc_star_member_ctes(rounds)}
SELECT n.id, coalesce(rep.rep_id, n.id) AS rep_id
FROM (SELECT CAST(id AS BIGINT) AS id FROM (VALUES {nodes_sql}) t(id)) n
LEFT JOIN rep ON rep.doc_id = n.id
ORDER BY n.id
"""
    con = duckdb.connect()
    try:
        return {r[0]: r[1] for r in con.execute(sql).fetchall()}
    finally:
        con.close()


def test_shuffled_path_worst_case():
    rng = random.Random(1)
    nodes = list(range(1, 401))
    perm = nodes[:]
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(len(perm) - 1)]
    got = _run_star(nodes, edges)
    assert got == _py_components(nodes, edges)
    assert set(got.values()) == {1}  # one component, min label


def test_random_graphs_match_union_find():
    for trial in range(25):
        rng = random.Random(100 + trial)
        n = rng.randint(2, 60)
        nodes = sorted(rng.sample(range(1, 200), n))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(0, 2 * n))
                for a, b in [(rng.choice(nodes), rng.choice(nodes))]
                if a != b
            }
        )
        got = _run_star(nodes, edges)
        want = _py_components(nodes, edges)
        assert got == want, (trial, nodes, edges)


def test_cliques_and_isolated():
    nodes = list(range(1, 21))
    edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]  # clique 1-5
    edges += [(10, 11), (11, 12)]
    got = _run_star(nodes, edges)
    assert all(got[i] == 1 for i in range(1, 6))
    assert got[10] == got[11] == got[12] == 10
    assert all(got[i] == i for i in list(range(6, 10)) + list(range(13, 21)))


def test_unconverged_poisons_loudly():
    # 1 round cannot converge a 50-node shuffled path: rep_id must come
    # back as the -1 poison (an impossible doc id that survives the
    # callers' coalesce), never a wrong-but-plausible labeling
    rng = random.Random(3)
    perm = list(range(1, 51))
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(49)]
    got = _run_star(list(range(1, 51)), edges, rounds=1)
    assert any(v == -1 for v in got.values())
