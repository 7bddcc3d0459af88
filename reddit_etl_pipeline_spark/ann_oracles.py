"""DuckDB oracle SQL for the hyperplane-LSH ANN queries.

These replay ``operators/similarity.lsh_bucket_table`` /
``split_hot_buckets`` / the candidate joins EXACTLY, so the driver's
value-hash compare checks the approximate LSH operators the same way it
checks the exact ones. Three facts make the replay bit-identical (before
round 5 these queries were declared rows-only "hash-family semantics
aren't SQL-expressible" — they are, once the arithmetic is exact):

1. Planes and vectors are snapped to the 1/PLANE_SCALE integer grid
   (similarity.PLANE_SCALE): the engine's float64 BLAS matmul over
   integer-valued operands never rounds (every product < 2^41, every
   partial sum < 2^47 < 2^53), so its sign bits equal the oracle's
   BIGINT ``list_sum`` dots. The quantized planes are emitted here as
   SQL integer literals from the same ``_table_planes`` stream.
2. ``auto_planes`` and the hot-bucket split ``step`` are integer
   bit-length formulas (ceil(log2(m)) = length(bin(m-1))), not libm
   ``log2`` — no last-ulp divergence near power-of-two boundaries.
3. The final cosine rerank rounds to RANK_DP before ranking and
   ROUND_DP at the boundary, the same contract every oracle-checked
   similarity query already uses.

The bucket CTE chain is shared by both queries; ``split_hot_buckets``'s
data-dependent loop is unrolled to its ``max_rounds`` (a round with no
hot buckets is a no-op, so a fixed unroll equals the engine's early
break).
"""

from __future__ import annotations

from .operators.similarity import PLANE_SCALE, VEC_SCALE, _table_planes

# Engine defaults replayed here (operators/similarity.py):
#   lsh_bucket_table: n_tables=8; split_hot_buckets: cap=256, eb=16,
#   max_rounds=4; auto_planes: target_bucket=32.
_N_TABLES = 8
_TOTAL_PLANES = 32  # n_planes (<=16) + extra_bits (16); prefix-stable
_CAP = 256
_EB = 16
_ROUNDS = 4


def _planes_values(dim: int, total: int = _TOTAL_PLANES) -> str:
    """(tbl, p, w BIGINT[dim]) literals for every plane any n_planes
    choice can touch — the identical quantized values the engine's
    matmul uses, via the same deterministic PCG64 stream (prefix-stable,
    so a ``total`` smaller than _TOTAL_PLANES emits the same values the
    full table's prefix would)."""
    import numpy as np

    rows = []
    for t in range(_N_TABLES):
        q = np.floor(
            _table_planes(t, total, dim) * PLANE_SCALE + 0.5
        ).astype("int64")
        for p in range(total):
            w = ",".join(str(v) for v in q[p])
            rows.append(f"({t},{p},[{w}]::BIGINT[])")
    return ",".join(rows)


def _bucket_ctes(dim: int, np_expr: str) -> str:
    """CTE chain: quantize -> project -> pack sign bits -> 4 unrolled
    hot-bucket split rounds. Ends at ``s{_ROUNDS}`` with columns
    (vec_id, tbl, bucket, ext, lvl, sub). ``np_expr`` computes n_planes
    from the corpus row count ``n`` (engine auto_planes variants)."""
    sql = [f"""
planes(tbl, p, w) AS (VALUES {_planes_values(dim)}),
n_t AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
np_t AS MATERIALIZED (
  SELECT {np_expr} AS np
  FROM (SELECT (n + 31) // 32 AS m FROM n_t)
),
qv AS MATERIALIZED (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * {PLANE_SCALE}.0 + 0.5) AS BIGINT)
          for x in embedding] AS q
  FROM embeddings
),
proj AS MATERIALIZED (
  SELECT v.vec_id, pl.tbl, pl.p,
         (list_sum([v.q[i] * pl.w[i]
                    for i in generate_series(1, {dim})]) >= 0) AS bit
  FROM qv v CROSS JOIN planes pl CROSS JOIN np_t
  WHERE pl.p < np_t.np + {_EB}
),
s0 AS MATERIALIZED (
  SELECT vec_id, tbl,
         CAST(COALESCE(sum(CASE WHEN bit AND p < np
                           THEN (1::BIGINT << p) END), 0) AS BIGINT) AS bucket,
         CAST(COALESCE(sum(CASE WHEN bit AND p >= np
                           THEN (1::BIGINT << (p - np)) END), 0) AS BIGINT) AS ext,
         0 AS lvl, CAST(0 AS BIGINT) AS sub
  FROM proj CROSS JOIN np_t
  GROUP BY vec_id, tbl
)"""]
    for r in range(_ROUNDS):
        sql.append(f""",
h{r} AS MATERIALIZED (
  SELECT tbl, bucket, lvl, sub,
         least(length(bin((n + {_CAP} - 1) // {_CAP} - 1)),
               {_EB} - lvl) AS step
  FROM (SELECT tbl, bucket, lvl, sub, count(*) AS n
        FROM s{r} GROUP BY tbl, bucket, lvl, sub)
  WHERE n > {_CAP} AND lvl < {_EB}
),
s{r + 1} AS MATERIALIZED (
  SELECT s.vec_id, s.tbl, s.bucket, s.ext,
         CASE WHEN h.step IS NOT NULL THEN s.lvl + h.step ELSE s.lvl END AS lvl,
         CASE WHEN h.step IS NOT NULL
              THEN s.ext & ((1::BIGINT << (s.lvl + h.step)) - 1)
              ELSE s.sub END AS sub
  FROM s{r} s LEFT JOIN h{r} h
    ON h.tbl = s.tbl AND h.bucket = s.bucket
   AND h.lvl = s.lvl AND h.sub = s.sub
)""")
    return "".join(sql)


# auto_planes(n): greatest(4, least(16, bit_length(ceil(n/32) - 1)))
_AUTO = "greatest(4, least(16, CASE WHEN m >= 2 THEN length(bin(m - 1)) ELSE 0 END))"


def lsh_neardup_oracle(threshold: float = 0.4, dim: int = 64) -> str:
    """Replay of ``embedding_neardup_pairs(df, dim, threshold)``:
    candidates collide in ANY table's refined bucket; verification is
    raw-norm cosine rounded to 6 dp at the threshold boundary (the
    engine's verify mapInPandas, similarity.py)."""
    s = f"s{_ROUNDS}"
    return f"""
WITH {_bucket_ctes(dim, _AUTO)},
cand AS MATERIALIZED (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM {s} x JOIN {s} y
    ON x.tbl = y.tbl AND x.bucket = y.bucket
   AND x.lvl = y.lvl AND x.sub = y.sub
   AND x.vec_id < y.vec_id
),
pv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS MATERIALIZED (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(a.v, b.v)
               / greatest(sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v)), 1e-12), 6) AS sim
  FROM cand c
  JOIN pv a ON a.vec_id = c.id_a
  JOIN pv b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, sim FROM sims WHERE sim >= {threshold}
"""


def incremental_embedding_neardup_oracle(
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 8,
) -> str:
    """Replay of ``streaming.stream.streamed_incremental_embedding_neardup``:
    even vec_ids seed the accepted vector index, odd ids stream in id
    order and are rejected iff cosine (rounded to 6 dp, the engine's
    verify contract) >= threshold against an already-accepted vector,
    candidates being multi-table LSH bucket collisions at the index's
    FIXED n_planes (no hot-bucket splitting — a growing index cannot
    re-bucket retroactively, stream.py). The greedy first-arrival
    acceptance is the same LFMIS walk as the MinHash twin
    (neardup_oracles.lfmis_walk_sql)."""
    from .neardup_oracles import lfmis_walk_sql

    return f"""
WITH RECURSIVE planes(tbl, p, w) AS (VALUES {_planes_values(dim, n_planes)}),
qv AS MATERIALIZED (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * {PLANE_SCALE}.0 + 0.5) AS BIGINT)
          for x in embedding] AS q
  FROM embeddings
),
bk AS MATERIALIZED (
  SELECT v.vec_id, pl.tbl,
         CAST(COALESCE(sum(CASE WHEN list_sum([v.q[i] * pl.w[i]
                    for i in generate_series(1, {dim})]) >= 0
                    THEN (1::BIGINT << pl.p) END), 0) AS BIGINT) AS bucket
  FROM qv v CROSS JOIN planes pl
  GROUP BY v.vec_id, pl.tbl
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bk x JOIN bk y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
pv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
edges AS MATERIALIZED (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN pv a ON a.vec_id = c.id_a
  JOIN pv b ON b.vec_id = c.id_b
  WHERE round(list_dot_product(a.v, b.v)
              / greatest(sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v)), 1e-12), 6)
        >= {threshold}
),
nodes AS MATERIALIZED (SELECT vec_id AS id FROM embeddings),
{lfmis_walk_sql("vec_id")}
"""


def lsh_topk_oracle(k: int = 5, dim: int = 64, n_queries: int = 5) -> str:
    """Replay of ``cosine_topk_lsh(emb, emb.filter(vec_id < n_queries),
    dim, k)``: corpus buckets are hot-split; each query probes its
    refined key at every level a split produced for its (tbl, bucket);
    exact rerank rounds to RANK_DP=12 before the row_number (the same
    contract as the oracle-checked cosine_topk)."""
    s = f"s{_ROUNDS}"
    # cosine_topk_lsh: n_planes = max(auto_planes(n) - 2, 4)
    np_expr = f"greatest({_AUTO} - 2, 4)"
    return f"""
WITH {_bucket_ctes(dim, np_expr)},
hot_levels AS MATERIALIZED (
  SELECT DISTINCT tbl, bucket, lvl FROM {s} WHERE lvl > 0
),
qprobe AS MATERIALIZED (
  SELECT q.vec_id AS query_id, q.tbl, q.bucket,
         COALESCE(hl.lvl, 0) AS lvl,
         CASE WHEN hl.lvl IS NOT NULL
              THEN q.ext & ((1::BIGINT << hl.lvl) - 1)
              ELSE CAST(0 AS BIGINT) END AS sub
  FROM s0 q LEFT JOIN hot_levels hl
    ON hl.tbl = q.tbl AND hl.bucket = q.bucket
  WHERE q.vec_id < {n_queries}
),
cand AS MATERIALIZED (
  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
  FROM {s} c JOIN qprobe qp
    ON c.tbl = qp.tbl AND c.bucket = qp.bucket
   AND c.lvl = qp.lvl AND c.sub = qp.sub
  WHERE c.vec_id <> qp.query_id
),
pv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS MATERIALIZED (
  SELECT cd.query_id, cd.neighbor_id,
         round(list_dot_product(q.v, c.v)
               / greatest(sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v)), 1e-12),
               12) AS sim
  FROM cand cd
  JOIN pv q ON q.vec_id = cd.query_id
  JOIN pv c ON c.vec_id = cd.neighbor_id
)
SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {k}
"""


# --------------------------------------------------------------------------
# IVF / PQ / IVF-PQ replays (operators/similarity.py unit-grid family).
#
# Everything below a unit-grid vector is exact integer arithmetic plus
# single correctly-rounded IEEE ops (see similarity.VEC_SCALE): Lloyd
# centroids are snapped back to the grid each update
# (floor(sum/count + 0.5)), distances / PQ lookup sums are exact integer
# sums, ties break to the lowest centroid/code id, and the final rerank
# uses the proven RANK_DP cosine contract. Each data-dependent loop is
# unrolled to its fixed iteration count (the engine runs no tolerance
# early-stop).
# --------------------------------------------------------------------------

_IVF_K = 16        # n_centroids
_IVF_NPROBE = 4
_IVF_ITERS = 5
_SAMPLE = 512
_PQ_M = 16         # subspaces
_PQ_CODES = 16
_PQ_ITERS = 5
_PQ_RERANK = 32


def _unit_ctes(dim: int) -> str:
    """``uv`` = (vec_id, label, u BIGINT[dim]) unit-grid vectors: quantize,
    exact-integer norm, one divide, re-quantize — bit-identical to the
    engine's ``_unit_grid``."""
    s = VEC_SCALE
    return f"""
qv0 AS MATERIALIZED (
  SELECT vec_id, label,
         [CAST(floor(CAST(x AS DOUBLE) * {s}.0 + 0.5) AS BIGINT)
          for x in embedding] AS q
  FROM embeddings
),
uv AS MATERIALIZED (
  SELECT vec_id, label,
         [CAST(floor(CAST(q[i] AS DOUBLE) / nrm * {s}.0 + 0.5) AS BIGINT)
          for i in generate_series(1, {dim})] AS u
  FROM (
    SELECT vec_id, label, q,
           greatest(sqrt(CAST(list_sum([x * x for x in q]) AS DOUBLE)),
                    1e-12) AS nrm
    FROM qv0
  )
)"""


def _ivf_ctes(dim: int, train_pred: str, iters: int = _IVF_ITERS) -> str:
    """Unrolled rounded-centroid Lloyd over the lowest-id ``_SAMPLE`` rows
    of ``uv`` filtered by ``train_pred``. Ends at ``cent{iters}`` =
    (j, p, c) exploded integer centroids and ``es`` = the exploded
    sample. Seeds: first ``_IVF_K`` distinct unit-grid vectors in id
    order (the kmeans_cluster_stats rule)."""
    sql = [f"""
samp AS MATERIALIZED (SELECT vec_id, u FROM uv WHERE {train_pred}
         ORDER BY vec_id LIMIT {_SAMPLE}),
seedv AS MATERIALIZED (SELECT u, min(vec_id) AS fid FROM samp GROUP BY u),
seed AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY fid) - 1 AS j, u
  FROM seedv ORDER BY fid LIMIT {_IVF_K}
),
es AS MATERIALIZED (
  SELECT vec_id, t.c['p'] AS p, t.c['q'] AS q
  FROM samp, unnest([{{'p': i - 1, 'q': u[i]}}
                     for i in generate_series(1, len(u))]) AS t(c)
),
cent0 AS MATERIALIZED (
  SELECT j, t.c['p'] AS p, t.c['q'] AS c
  FROM seed, unnest([{{'p': i - 1, 'q': u[i]}}
                     for i in generate_series(1, len(u))]) AS t(c)
)"""]
    for i in range(iters):
        sql.append(f""",
a{i} AS MATERIALIZED (
  SELECT e.vec_id, c.j, sum((e.q - c.c) * (e.q - c.c)) AS d2
  FROM es e JOIN cent{i} c ON c.p = e.p
  GROUP BY e.vec_id, c.j
),
asg{i} AS MATERIALIZED (
  SELECT vec_id, j FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
    FROM a{i}
  ) WHERE rn = 1
),
cent{i + 1} AS MATERIALIZED (
  SELECT c.j, c.p,
         COALESCE(
           CAST(floor(CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE) + 0.5)
                AS BIGINT),
           c.c) AS c
  FROM cent{i} c LEFT JOIN (
    SELECT g.j, e.p, sum(e.q) AS s, count(*) AS n
    FROM asg{i} g JOIN es e USING (vec_id) GROUP BY g.j, e.p
  ) m ON m.j = c.j AND m.p = c.p
)""")
    return "".join(sql)


def _assign_ctes(
    name: str, src_pred: str, cent: str, dim: int, topn: int
) -> str:
    """``{name}`` = (vec_id, cid[, arn]) — nearest (topn=1) or top-n
    probed centroids of every ``uv`` row matching ``src_pred``, by exact
    integer squared L2, ties to the lowest centroid id."""
    ea = f"""
  SELECT v.vec_id, t.c['p'] AS p, t.c['q'] AS q
  FROM (SELECT vec_id, u FROM uv WHERE {src_pred}) v,
       unnest([{{'p': i - 1, 'q': u[i]}}
               for i in generate_series(1, len(u))]) AS t(c)"""
    arn = ", arn" if topn > 1 else ""
    return f"""
{name} AS MATERIALIZED (
  SELECT vec_id, j AS cid{arn} FROM (
    SELECT e.vec_id, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY sum((e.q - c.c) * (e.q - c.c)), c.j) AS arn
    FROM ({ea}) e JOIN {cent} c ON c.p = e.p
    GROUP BY e.vec_id, c.j
  ) WHERE arn <= {topn}
)"""


_RERANK_SQL = """
pv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS MATERIALIZED (
  SELECT cd.query_id, cd.neighbor_id,
         round(list_dot_product(q.v, c.v)
               / greatest(sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v)), 1e-12),
               12) AS sim
  FROM cand cd
  JOIN pv q ON q.vec_id = cd.query_id
  JOIN pv c ON c.vec_id = cd.neighbor_id
)
SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored) r
WHERE rank <= {k}
"""


def ivf_topk_oracle(k: int = 5, dim: int = 64, n_queries: int = 5) -> str:
    """Replay of ``ivf_topk(emb, emb.filter(vec_id < n_queries), k)``:
    integer-grid coarse quantizer, nprobe probed lists, exact rerank."""
    return f"""
WITH {_unit_ctes(dim)},
{_ivf_ctes(dim, 'TRUE')},
{_assign_ctes('cassign', 'TRUE', f'cent{_IVF_ITERS}', dim, 1)},
{_assign_ctes('qprobe', f'vec_id < {n_queries}', f'cent{_IVF_ITERS}', dim, _IVF_NPROBE)},
cand AS MATERIALIZED (
  SELECT DISTINCT qp.vec_id AS query_id, ca.vec_id AS neighbor_id
  FROM qprobe qp JOIN cassign ca ON ca.cid = qp.cid
  WHERE ca.vec_id <> qp.vec_id
),
{_RERANK_SQL.format(k=k)}
"""


def ivf_knn_confusion_oracle(
    k: int = 5, dim: int = 64, test_max: int = 4000
) -> str:
    """Replay of ``knn_label_confusion(train=even, test=odd<test_max,
    k=5, method='ivf')``: the IVF top-k above feeds the same
    vote/argmax stage as the oracle-checked exact kNN query."""
    return f"""
WITH {_unit_ctes(dim)},
{_ivf_ctes(dim, 'vec_id % 2 = 0')},
{_assign_ctes('cassign', 'vec_id % 2 = 0', f'cent{_IVF_ITERS}', dim, 1)},
{_assign_ctes('qprobe', f'vec_id % 2 = 1 AND vec_id < {test_max}', f'cent{_IVF_ITERS}', dim, _IVF_NPROBE)},
cand AS MATERIALIZED (
  SELECT DISTINCT qp.vec_id AS query_id, ca.vec_id AS neighbor_id
  FROM qprobe qp JOIN cassign ca ON ca.cid = qp.cid
  WHERE ca.vec_id <> qp.vec_id
),
pv AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS MATERIALIZED (
  SELECT cd.query_id, cd.neighbor_id,
         round(list_dot_product(q.v, c.v)
               / greatest(sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v)), 1e-12),
               12) AS sim
  FROM cand cd
  JOIN pv q ON q.vec_id = cd.query_id
  JOIN pv c ON c.vec_id = cd.neighbor_id
),
topk AS MATERIALIZED (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored) r
  WHERE rank <= {k}
),
lbl AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS n_label FROM embeddings),
votes AS MATERIALIZED (
  SELECT t.query_id, l.n_label,
         count(*) AS n_votes, min(t.rank) AS best_rank
  FROM topk t JOIN lbl l ON l.vec_id = t.neighbor_id
  GROUP BY t.query_id, l.n_label
),
pred AS MATERIALIZED (
  SELECT query_id, n_label AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY n_votes DESC, best_rank, n_label) AS rn
    FROM votes) v
  WHERE rn = 1
),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(label AS BIGINT) AS actual
  FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < {test_max}
)
SELECT q.actual, COALESCE(p.predicted, -1) AS predicted,
       count(*) AS n_vecs
FROM q LEFT JOIN pred p ON q.query_id = p.query_id
GROUP BY 1, 2
"""


def _pq_lloyd_ctes(src: str, pre: str, iters: int = _PQ_ITERS) -> str:
    """Per-subspace rounded-centroid Lloyd over an exploded integer
    source ``src`` = (vec_id, s, p, q) RESTRICTED to the training
    sample. One CTE chain handles all ``_PQ_M`` subspaces at once (the
    subspace id is a grouping column). Seeds: first ``_PQ_CODES``
    distinct subvectors per subspace in id order; a subspace with fewer
    distinct subvectors seeds them all (the engine pads its codebook by
    repeating the last centroid, but a repeated centroid can never win
    an argmin tie against its lower-id original, so omitting the pad
    replays identically). Ends at ``{pre}cent{iters}`` = (s, j, p, c)."""
    sql = [f"""
{pre}sb AS MATERIALIZED (
  SELECT vec_id, s, list(q ORDER BY p) AS v
  FROM {src} GROUP BY vec_id, s
),
{pre}seedv AS MATERIALIZED (
  SELECT s, v, min(vec_id) AS fid FROM {pre}sb GROUP BY s, v
),
{pre}seed AS MATERIALIZED (
  SELECT s, row_number() OVER (PARTITION BY s ORDER BY fid) - 1 AS j, v
  FROM {pre}seedv
  QUALIFY row_number() OVER (PARTITION BY s ORDER BY fid) <= {_PQ_CODES}
),
{pre}cent0 AS MATERIALIZED (
  SELECT s, j, t.c['p'] AS p, t.c['q'] AS c
  FROM {pre}seed, unnest([{{'p': i - 1, 'q': v[i]}}
                          for i in generate_series(1, len(v))]) AS t(c)
)"""]
    for i in range(iters):
        sql.append(f""",
{pre}a{i} AS MATERIALIZED (
  SELECT e.vec_id, e.s, c.j, sum((e.q - c.c) * (e.q - c.c)) AS d2
  FROM {src} e JOIN {pre}cent{i} c ON c.s = e.s AND c.p = e.p
  GROUP BY e.vec_id, e.s, c.j
),
{pre}asg{i} AS MATERIALIZED (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
    FROM {pre}a{i}
  ) WHERE rn = 1
),
{pre}cent{i + 1} AS MATERIALIZED (
  SELECT c.s, c.j, c.p,
         COALESCE(
           CAST(floor(CAST(m.sm AS DOUBLE) / CAST(m.n AS DOUBLE) + 0.5)
                AS BIGINT),
           c.c) AS c
  FROM {pre}cent{i} c LEFT JOIN (
    SELECT g.s, g.j, e.p, sum(e.q) AS sm, count(*) AS n
    FROM {pre}asg{i} g
    JOIN {src} e ON e.vec_id = g.vec_id AND e.s = g.s
    GROUP BY g.s, g.j, e.p
  ) m ON m.s = c.s AND m.j = c.j AND m.p = c.p
)""")
    return "".join(sql)


def _sub_explode(name: str, src_pred: str, sub: int) -> str:
    """``{name}`` = (vec_id, s, p, q): ``uv`` rows matching ``src_pred``
    exploded into ``dim/sub`` contiguous sub-vectors."""
    return f"""
{name} AS MATERIALIZED (
  SELECT vec_id, (t.c['i'] - 1) // {sub} AS s,
         (t.c['i'] - 1) % {sub} AS p, t.c['q'] AS q
  FROM (SELECT vec_id, u FROM uv WHERE {src_pred}) v,
       unnest([{{'i': i, 'q': u[i]}}
               for i in generate_series(1, len(u))]) AS t(c)
)"""


def pq_topk_oracle(
    k: int = 5, dim: int = 64, n_queries: int = 5
) -> str:
    """Replay of ``pq_topk(emb, emb.filter(vec_id < n_queries), k)``:
    unit-grid vectors, per-subspace rounded-centroid codebooks, integer
    asymmetric-distance lookup sums, global top-``_PQ_RERANK`` candidate
    cut by (approx DESC, id), exact rerank."""
    sub = dim // _PQ_M
    it = _PQ_ITERS
    return f"""
WITH {_unit_ctes(dim)},
samp AS MATERIALIZED (SELECT vec_id FROM uv ORDER BY vec_id LIMIT {_SAMPLE}),
{_sub_explode('sv', 'TRUE', sub)},
svs AS MATERIALIZED (SELECT sv.* FROM sv JOIN samp USING (vec_id)),
{_pq_lloyd_ctes('svs', 'p')},
enc AS MATERIALIZED (
  SELECT vec_id, s, j AS code FROM (
    SELECT e.vec_id, e.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, e.s
             ORDER BY sum((e.q - c.c) * (e.q - c.c)), c.j) AS rn
    FROM sv e JOIN pcent{it} c ON c.s = e.s AND c.p = e.p
    GROUP BY e.vec_id, e.s, c.j
  ) WHERE rn = 1
),
lut AS MATERIALIZED (
  SELECT e.vec_id AS query_id, e.s, c.j,
         sum(e.q * c.c) AS l
  FROM sv e JOIN pcent{it} c ON c.s = e.s AND c.p = e.p
  WHERE e.vec_id < {n_queries}
  GROUP BY e.vec_id, e.s, c.j
),
adc AS MATERIALIZED (
  SELECT l.query_id, e.vec_id AS neighbor_id, sum(l.l) AS approx
  FROM enc e JOIN lut l ON l.s = e.s AND l.j = e.code
  WHERE e.vec_id <> l.query_id
  GROUP BY l.query_id, e.vec_id
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, neighbor_id) AS arn
    FROM adc
  ) WHERE arn <= {_PQ_RERANK}
),
{_RERANK_SQL.format(k=k)}
"""


def ivfpq_topk_oracle(
    k: int = 5, dim: int = 64, n_queries: int = 5
) -> str:
    """Replay of ``ivf_pq_topk(emb, emb.filter(vec_id < n_queries), k)``
    — the full FAISS-style composition: integer-grid coarse quantizer,
    PQ codebooks fit on the sample's RESIDUALS, corpus scanned as codes
    within each query's ``_IVF_NPROBE`` probed lists,
    approx = q·centroid + Σ LUT (all exact integers), global
    top-``_PQ_RERANK`` cut, exact rerank."""
    sub = dim // _PQ_M
    it = _PQ_ITERS
    civf = f"cent{_IVF_ITERS}"
    return f"""
WITH {_unit_ctes(dim)},
{_ivf_ctes(dim, 'TRUE')},
{_assign_ctes('cassign', 'TRUE', civf, dim, 1)},
{_assign_ctes('qprobe', f'vec_id < {n_queries}', civf, dim, _IVF_NPROBE)},
res AS MATERIALIZED (
  SELECT v.vec_id, (t.c['i'] - 1) // {sub} AS s,
         (t.c['i'] - 1) % {sub} AS p,
         t.c['q'] - cc.c AS q
  FROM (SELECT vec_id, u FROM uv) v
  JOIN cassign a USING (vec_id),
       unnest([{{'i': i, 'q': u[i]}}
               for i in generate_series(1, len(u))]) AS t(c)
  JOIN {civf} cc ON cc.j = a.cid AND cc.p = t.c['i'] - 1
),
ress AS MATERIALIZED (SELECT res.* FROM res JOIN (SELECT vec_id FROM samp) sp USING (vec_id)),
{_pq_lloyd_ctes('ress', 'p')},
enc AS MATERIALIZED (
  SELECT vec_id, s, j AS code FROM (
    SELECT e.vec_id, e.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, e.s
             ORDER BY sum((e.q - c.c) * (e.q - c.c)), c.j) AS rn
    FROM res e JOIN pcent{it} c ON c.s = e.s AND c.p = e.p
    GROUP BY e.vec_id, e.s, c.j
  ) WHERE rn = 1
),
{_sub_explode('qsv', f'vec_id < {n_queries}', sub)},
lut AS MATERIALIZED (
  SELECT e.vec_id AS query_id, e.s, c.j, sum(e.q * c.c) AS l
  FROM qsv e JOIN pcent{it} c ON c.s = e.s AND c.p = e.p
  GROUP BY e.vec_id, e.s, c.j
),
cent_term AS MATERIALIZED (
  SELECT e.vec_id AS query_id, qp.cid,
         sum(e.q * cc.c) AS ct
  FROM qsv e
  JOIN qprobe qp ON qp.vec_id = e.vec_id
  JOIN {civf} cc ON cc.j = qp.cid AND cc.p = e.s * {sub} + e.p
  GROUP BY e.vec_id, qp.cid
),
adc AS MATERIALIZED (
  SELECT l.query_id, e.vec_id AS neighbor_id,
         sum(l.l) + min(ct.ct) AS approx
  FROM enc e
  JOIN cassign a ON a.vec_id = e.vec_id
  JOIN cent_term ct ON ct.cid = a.cid
  JOIN lut l ON l.query_id = ct.query_id AND l.s = e.s AND l.j = e.code
  WHERE e.vec_id <> l.query_id
  GROUP BY l.query_id, e.vec_id
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, neighbor_id) AS arn
    FROM adc
  ) WHERE arn <= {_PQ_RERANK}
),
{_RERANK_SQL.format(k=k)}
"""


def semantic_dedup_learned_oracle(
    threshold: float = 0.97, dim: int = 64
) -> str:
    """Replay of ``semantic_dedup(emb, threshold, n_centroids=16,
    quantizer='learned')``: the integer-grid coarse k-means assigns the
    cluster ids (same unrolled Lloyd as the IVF replay); within each
    cluster a vector is a duplicate iff a LOWER-id mate reaches the
    cosine threshold (the signbit variant's proven EXISTS shape)."""
    civf = f"cent{_IVF_ITERS}"
    return f"""
WITH {_unit_ctes(dim)},
{_ivf_ctes(dim, 'TRUE')},
{_assign_ctes('cassign', 'TRUE', civf, dim, 1)},
e AS MATERIALIZED (
  SELECT em.vec_id, CAST(em.embedding AS DOUBLE[]) AS v, ca.cid
  FROM embeddings em JOIN cassign ca USING (vec_id)
)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM e b
         WHERE b.cid = a.cid AND b.vec_id < a.vec_id
           AND round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
       ) THEN 0 ELSE 1 END AS BIGINT) AS keep
FROM e a
"""
