"""The recursive LFMIS walk (neardup_oracles.lfmis_walk_sql) vs the
engine's greedy_accept_order, on random graphs.

The streaming corpus builds' oracle = pair-graph replay (already pinned
by the batch twins' hash-matched oracles) + this walk; the walk is the
only new moving part, so it gets its own adversarial check: random node
sets (mixed parity), random edge sets, compared against a direct Python
simulation of the streaming policy (seed evens accepted unconditionally,
odds greedy first-arrival in id order). No Spark session needed."""

import random

import duckdb
import pytest

from reddit_etl_pipeline_spark.neardup_oracles import lfmis_walk_sql
from reddit_etl_pipeline_spark.operators.dedup import greedy_accept_order


def _streaming_greedy(nodes: list[int], edges: list[tuple[int, int]]) -> list[int]:
    """Reference: evens are the pre-accepted seed corpus; odds processed
    ascending, rejected iff any already-accepted neighbor."""
    nbrs: dict[int, set[int]] = {n: set() for n in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    accepted = {n for n in nodes if n % 2 == 0}
    out = []
    for d in sorted(n for n in nodes if n % 2 == 1):
        if not (nbrs[d] & accepted):
            accepted.add(d)
            out.append(d)
    return out


def _run_walk(nodes: list[int], edges: list[tuple[int, int]]) -> list[int]:
    nodes_sql = ",".join(f"({n})" for n in nodes)
    if edges:
        edges_sql = (
            "SELECT u AS id_a, v AS id_b FROM (VALUES "
            + ",".join(f"({min(a, b)},{max(a, b)})" for a, b in edges)
            + ") t(u, v)"
        )
    else:
        edges_sql = "SELECT 0::BIGINT AS id_a, 0::BIGINT AS id_b WHERE 1 = 0"
    sql = f"""
WITH RECURSIVE nodes AS (SELECT CAST(id AS BIGINT) AS id
                         FROM (VALUES {nodes_sql}) t(id)),
edges AS ({edges_sql}),
{lfmis_walk_sql("doc_id")}
"""
    con = duckdb.connect()
    try:
        return sorted(r[0] for r in con.execute(sql).fetchall())
    finally:
        con.close()


def test_walk_matches_streaming_greedy_on_random_graphs():
    for trial in range(40):
        rng = random.Random(trial)
        n = rng.randint(1, 24)
        nodes = sorted(rng.sample(range(1, 60), n))
        n_edges = rng.randint(0, 3 * n)
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(n_edges)
                for a, b in [(rng.choice(nodes), rng.choice(nodes))]
                if a != b
            }
        )
        got = _run_walk(nodes, edges)
        want = _streaming_greedy(nodes, edges)
        assert got == want, (trial, nodes, edges, got, want)


def test_walk_path_graph_alternates():
    # odd-only path 1-3-5-7-9: greedy accepts 1, 5, 9
    nodes = [1, 3, 5, 7, 9]
    edges = [(1, 3), (3, 5), (5, 7), (7, 9)]
    assert _run_walk(nodes, edges) == [1, 5, 9]


def test_walk_seed_blocks_regardless_of_id():
    # even 10 blocks odd 3 (seed precedes every odd despite larger id);
    # odd 5 similar only to the rejected 3 survives
    nodes = [3, 5, 10]
    edges = [(3, 10), (3, 5)]
    assert _run_walk(nodes, edges) == [5]


def test_walk_agrees_with_greedy_accept_order_on_odd_only_graphs():
    # with no evens the walk IS greedy_accept_order (the operator the
    # streaming builds use within-batch)
    for trial in range(20):
        rng = random.Random(1000 + trial)
        n = rng.randint(1, 20)
        nodes = sorted(rng.sample(range(1, 99, 2), n))  # odd ids only
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(0, 2 * n))
                for a, b in [(rng.choice(nodes), rng.choice(nodes))]
                if a != b
            }
        )
        got = _run_walk(nodes, edges)
        want = sorted(greedy_accept_order(nodes, edges))
        assert got == want, (trial, nodes, edges, got, want)
