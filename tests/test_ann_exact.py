"""Pins for the ANN integer-grid exactness contract (similarity.py).

The oracle lifts of the LSH/IVF/PQ family rest on three invariants that
ordinary result tests cannot see directly; these tests make them
regression-proof:

1. grid values stay small enough that every product and partial sum in
   the float64 kernels is an exactly-representable integer (< 2^53);
2. the BLAS matmul over those integer-valued floats equals exact
   big-int arithmetic (no rounding anywhere), so DuckDB's BIGINT replay
   sees the same sign bits / distances;
3. approximate candidate sets do not depend on the physical
   partitioning (the r4 advice item on partition-dependent rerank cuts).
"""

import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators import similarity as S  # noqa: E402

DIM = 64


vec_strategy = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=DIM,
    max_size=DIM,
)


@given(st.lists(vec_strategy, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_unit_grid_integer_and_bounded(vecs):
    u = S._unit_grid(np.array(vecs, dtype="float64"))
    assert np.all(u == np.floor(u)), "unit grid must be integer-valued"
    # |q_i| / ||q|| <= 1, so |u| <= VEC_SCALE after the floor(+0.5)
    assert np.all(np.abs(u) <= S.VEC_SCALE)


@given(st.lists(vec_strategy, min_size=2, max_size=8))
@settings(max_examples=25, deadline=None)
def test_grid_lloyd_matches_bigint_arithmetic(vecs):
    """The float64 Lloyd kernel must equal exact Python-int replay:
    distances, tie-breaks, and rounded centroid updates."""
    u = S._unit_grid(np.array(vecs, dtype="float64"))
    k = min(3, len(u))
    cents = S._grid_lloyd(u, k, iters=3)
    assert np.all(cents == np.floor(cents))

    # exact big-int replay of the same loop
    ui = [[int(v) for v in row] for row in u]
    ci = [[int(v) for v in row] for row in S._first_distinct_rows(u, k)]
    for _ in range(3):
        assign = []
        for row in ui:
            d2s = [
                sum((a - b) * (a - b) for a, b in zip(row, c)) for c in ci
            ]
            assign.append(d2s.index(min(d2s)))  # first min -> lowest j
        nxt = [list(c) for c in ci]
        for j in range(len(ci)):
            members = [ui[i] for i, a in enumerate(assign) if a == j]
            if members:
                n = len(members)
                nxt[j] = [
                    int(np.floor(sum(col) / n + 0.5))
                    for col in zip(*members)
                ]
        ci = nxt
    assert cents.astype("int64").tolist() == ci


@given(st.lists(vec_strategy, min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_lsh_projection_matches_bigint_dot(vecs):
    """Quantized-plane BLAS projections must carry the same sign as an
    exact big-int dot product (pin for the 'matmul never rounds' claim
    the DuckDB replay depends on)."""
    m = S._quantize_grid(np.array(vecs, dtype="float64"))
    planes = S._quantize_grid(S._table_planes(0, 8, DIM))
    proj = m @ planes.T
    assert np.all(proj == np.floor(proj))
    for r, row in enumerate(m):
        for p in range(planes.shape[0]):
            exact = sum(int(a) * int(b) for a, b in zip(row, planes[p]))
            assert int(proj[r, p]) == exact


def test_overflow_headroom():
    """Worst-case magnitudes of every integer the kernels sum must stay
    below 2^53 (float64 exactness) — computed from the actual scales so
    a scale bump cannot silently break the oracle contract."""
    # LSH: |x| <= 1-ish embeddings, gaussian planes |g| <= ~6 sigma
    worst_term = (1.5 * S.PLANE_SCALE) * (6.5 * S.PLANE_SCALE)
    assert worst_term * DIM < 2**53
    # IVF/PQ: |u| <= VEC_SCALE, centroids on the same grid, residuals 2x
    worst_d2 = (2 * 2 * S.VEC_SCALE) ** 2 * DIM
    assert worst_d2 < 2**53
    # ADC: m sub-dots of sub-dim components plus a centroid term
    sub = DIM // 16
    worst_adc = 16 * sub * (S.VEC_SCALE * 2 * S.VEC_SCALE) + DIM * (
        S.VEC_SCALE * S.VEC_SCALE
    )
    assert worst_adc < 2**53


@pytest.mark.usefixtures("spark")
@pytest.mark.slow
def test_pq_candidates_partition_independent(spark, sf_dir):
    """pq_topk's final top-k must not change with the physical layout
    (global (approx DESC, id) cut — the r4 advice fix)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter("vec_id < 3")
    a = S.pq_topk(emb.repartition(1), q, k=4).collect()
    b = S.pq_topk(emb.repartition(13, "vec_id"), q, k=4).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_ivf_topk_handles_fewer_centroids_than_nprobe(spark):
    """A duplicate-heavy corpus can train fewer distinct centroids than
    nprobe; the query-side assigner must emit min(nprobe, k) probes per
    query instead of a ragged Arrow batch (round-5 review crash)."""
    rows = [(i, [float(i % 2)] * DIM) for i in range(12)]  # 2 distinct vecs
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.ivf_topk(df, df, k=2, n_centroids=8, nprobe=4).collect()
    assert len(out) > 0
    # every neighbor of an even-id query shares its vector (cos = 1)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(12))
