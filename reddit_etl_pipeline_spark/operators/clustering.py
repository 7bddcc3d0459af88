"""Distributed Lloyd k-means over embedding columns.

The IVF coarse quantizer (operators/similarity.py:253) trains on a small
driver-side sample — right for bucketing, but not a corpus clustering.
This module is the full distributed algorithm: every iteration assigns
EVERY vector and updates centroids from corpus-wide statistics, with the
driver holding only the k x dim centroid matrix.

Scale design (100 TB):
- Assignment + update statistics happen in ONE Arrow-batched mapInPandas
  pass per iteration: each batch emits at most k partial rows
  (cluster, count, component sums, SSE) — the per-iteration shuffle is
  O(partitions x k), never O(rows).
- Component sums reduce via posexplode + groupBy(cluster, pos) — all
  whole-stage codegen, no higher-order-function lambdas (CLAUDE.md rule).
- The driver collects k x (dim + 2) numbers per iteration; centroids ship
  back inside the next iteration's closure (broadcast-by-serialization).
- Iteration count is the only driver-side loop — standard for Lloyd on
  any engine; each round is a full distributed pass.

Deterministic given a fixed partitioning. Across DIFFERENT partitionings
results agree to float tolerance (partial sums reduce in partition order);
assignments are identical unless a point sits exactly on a Voronoi
boundary. Empty clusters keep their previous centroid.

No counterpart in the reference (pandas/psycopg2 pipeline —
airflow/extraction/extract-from-reddit.py); this is part of the
training-data extension surface (SemDeDup/IVF both consume clusterings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans_cluster_stats"]


def _centroid_init(df: DataFrame, k: int, id_col: str, vec_col: str):
    """Deterministic seed: the k lowest-id DISTINCT vectors (duplicate
    embeddings would seed coincident centroids and freeze them)."""
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(4 * k)
        .collect()
    )
    seen: list = []
    for r in rows:
        v = tuple(r[1])
        if v not in seen:
            seen.append(v)
        if len(seen) == k:
            break
    if not seen:
        raise ValueError("cannot seed k-means from an empty corpus")
    return np.array([list(v) for v in seen], dtype="float64")


def _partial_stats(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    """One distributed pass: per Arrow batch, assign each vector to its
    nearest centroid (squared L2) and emit per-cluster partials:
    (cluster, n, sums array<double>, sse)."""
    import numpy as np
    import pandas as pd

    c = centroids  # closure-captured k x dim float64

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2  (vectorized)
            d2 = (
                (m * m).sum(axis=1, keepdims=True)
                - 2.0 * (m @ c.T)
                + (c * c).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            out_rows = []
            for j in np.unique(assign):
                members = m[assign == j]
                out_rows.append(
                    (
                        int(j),
                        len(members),
                        members.sum(axis=0).tolist(),
                        float(d2[assign == j, j].sum()),
                    )
                )
            yield pd.DataFrame(
                out_rows, columns=["cluster", "n", "sums", "sse"]
            )

    return df.select(vec_col).mapInPandas(
        run, "cluster long, n long, sums array<double>, sse double"
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit k-means with full-corpus Lloyd iterations.

    Returns ``(centroids, inertia_history)`` — centroids as a k x dim
    numpy array, one inertia (total SSE) per completed iteration.
    Stops early when the max centroid shift falls below ``tol``.
    """
    import numpy as np

    cents = _centroid_init(df, k, id_col, vec_col)
    k = len(cents)
    history: list[float] = []
    for _ in range(max_iter):
        partials = _partial_stats(df, cents, vec_col)
        # ONE job per iteration: counts + SSE fold into the same
        # posexplode aggregate as the component sums, so the expensive
        # full-corpus assignment pass runs exactly once (two separate
        # collects would re-trigger mapInPandas — or need a persist whose
        # cache-build overhead exceeds the recompute at small scale).
        # Every (cluster, pos) group sums the same partial rows, so n/sse
        # totals are read off the pos==0 groups. O(partitions * k * dim)
        # rows into the agg, k * dim out — codegen, driver-bounded.
        comp = (
            partials.select(
                "cluster", "n", "sse", F.posexplode("sums").alias("pos", "v")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum("v").alias("s"),
                F.sum("n").alias("n"),
                F.sum("sse").alias("sse"),
            )
            .collect()
        )
        new = cents.copy()
        sums = np.zeros_like(cents)
        counts: dict[int, tuple[int, float]] = {}
        for r in comp:
            sums[r["cluster"], r["pos"]] = r["s"]
            if r["pos"] == 0:
                counts[r["cluster"]] = (r["n"], r["sse"])
        for j, (n, _sse) in counts.items():
            if n > 0:
                new[j] = sums[j] / n
        history.append(float(sum(sse for _n, sse in counts.values())))
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents, history


def kmeans_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only assignment of every vector to its nearest centroid:
    (id, cluster, sqdist)."""
    import numpy as np
    import pandas as pd

    c = np.asarray(centroids, dtype="float64")

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            d2 = (
                (m * m).sum(axis=1, keepdims=True)
                - 2.0 * (m @ c.T)
                + (c * c).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": assign.astype("int64"),
                    "sqdist": d2[np.arange(len(m)), assign],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, cluster long, sqdist double"
    )


def kmeans_cluster_stats(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + assign + per-cluster quality rollup:
    (cluster, n_points, avg_sqdist, max_sqdist). Rows-only driver check
    (numpy float geometry isn't SQL-expressible); accuracy properties are
    pinned in tests/test_clustering.py."""
    cents, _ = kmeans_fit(df, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("sqdist"), 6).alias("avg_sqdist"),
        F.round(F.max("sqdist"), 6).alias("max_sqdist"),
    )
