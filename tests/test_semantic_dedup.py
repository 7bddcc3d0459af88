"""Property tests for SemDeDup-style semantic deduplication.

Within-cluster behavior is EXACT (verified by numpy recomputation);
cross-cluster misses are the documented approximation, bounded here by a
recall floor on a seeded twin corpus (near-identical vectors land in the
same cluster except at boundaries).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators.similarity import semantic_dedup

THRESH = 0.97


def _emb_df(spark, mat, ids=None):
    ids = ids if ids is not None else range(len(mat))
    rows = [(int(i), [float(v) for v in row]) for i, row in zip(ids, mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _seeded_corpus(seed=7, n_base=60, dim=32, twins_every=4):
    """Random unit vectors; every ``twins_every``-th gets a near-identical
    twin (tiny perturbation -> cosine ~0.999)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, pairs = [], []
    vid = 0
    for i, v in enumerate(base):
        vecs.append((vid, v))
        a = vid
        vid += 1
        if i % twins_every == 0:
            t = v + 0.01 * rng.standard_normal(dim)
            t /= np.linalg.norm(t)
            vecs.append((vid, t))
            pairs.append((a, vid))
            vid += 1
    ids = [i for i, _ in vecs]
    mat = np.stack([v for _, v in vecs])
    return ids, mat, pairs


def test_within_cluster_exactness(spark):
    ids, mat, _ = _seeded_corpus()
    out = semantic_dedup(_emb_df(spark, mat, ids), threshold=THRESH, n_centroids=4)
    rows = out.collect()
    assert {r.vec_id for r in rows} == set(ids)  # every vector classified once

    byid = {r.vec_id: r for r in rows}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    id2row = {v: i for i, v in enumerate(ids)}
    # recompute: keep == 0 iff a lower-id same-cluster mate is >= threshold
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cid, []).append(r.vec_id)
    for cid, members in clusters.items():
        members = sorted(members)
        for j, vj in enumerate(members):
            expect_dup = any(
                float(norm[id2row[vi]] @ norm[id2row[vj]]) >= THRESH
                for vi in members[:j]
            )
            assert byid[vj].keep == (0 if expect_dup else 1), (cid, vj)


def test_twin_recall_floor(spark):
    ids, mat, pairs = _seeded_corpus()
    out = semantic_dedup(_emb_df(spark, mat, ids), threshold=THRESH, n_centroids=4)
    keep = {r.vec_id: r.keep for r in out.collect()}
    # a twin pair is "caught" when its later member was dropped
    caught = sum(1 for a, b in pairs if keep[b] == 0)
    assert caught / len(pairs) >= 0.8  # cluster-boundary misses only
    # and non-twin vectors survive (no spurious dedup among random vectors)
    twin_members = {b for _, b in pairs}
    assert all(keep[i] == 1 for i in ids if i not in twin_members)


def test_semantic_dedup_deterministic(spark, embeddings):
    a = semantic_dedup(embeddings, threshold=0.97, n_centroids=8)
    b = semantic_dedup(embeddings, threshold=0.97, n_centroids=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.filter(F.col("keep") == 0).count() == b.filter(F.col("keep") == 0).count()
