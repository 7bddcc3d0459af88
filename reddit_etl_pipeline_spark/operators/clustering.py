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


def _quantize_vectors(
    df: DataFrame, scale: int, id_col: str, vec_col: str
) -> DataFrame:
    """Map-only quantization to the integer grid: q = floor(x*scale+0.5)
    per component (float64 multiply/add/floor — each an exactly-rounded
    IEEE op, so any engine computes the identical integer)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            q = np.floor(m * scale + 0.5).astype("int64")
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "q": list(q)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, q array<bigint>"
    )


def kmeans_cluster_stats(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + assign + per-cluster quality rollup:
    (cluster, n_points, avg_sqdist, max_sqdist) — Lloyd k-means over
    embeddings QUANTIZED to the 1/``scale`` grid, formulated so every
    step is exact integer arithmetic or a correctly-rounded double op
    and the whole loop replays bit-identically in ANSI SQL (the DuckDB
    oracle unrolls it as per-iteration CTEs, like the PageRank/BPE
    lifts):

    - centroid state is (component-sums s, count n) in int64 — never a
      float mean, so the update is order-independent exact addition;
    - the squared distance to centroid j is compared via
      A_j / n_j^2 with A_j = sum_d (n_j*q_d - s_{j,d})^2, an exact
      int64 (inputs bounded: |q| <= scale*|x|max, n <= corpus rows —
      overflow-safe up to ~3e5 rows at scale 1000, dim 64; larger
      corpora lower ``scale``), divided as float64 (correctly-rounded,
      engine-independent); ties break to the lowest cluster id;
    - fixed ``max_iter`` iterations (no float tolerance early-stop — a
      converged iteration is a no-op anyway), seeds = first k distinct
      quantized vectors by id among the first 4k rows;
    - final stats divide exact integer numerators by exact integer
      denominators (n_points * n_j^2 * scale^2), rounded to 6 dp.

    At 1/1000 quantization the clustering is materially identical to the
    float path (``kmeans_fit``/``kmeans_assign``, kept for callers that
    want raw float geometry); what it buys is a value-hash-checkable
    driver query. Scale shape is unchanged: one Arrow map pass per
    iteration emitting O(partitions*k) integer partials, driver holds
    k x dim ints.
    """
    import numpy as np
    import pandas as pd

    # quantized vectors feed max_iter+1 full passes; checkpoint so the
    # source scan + quantization run once
    qdf = _quantize_vectors(df, scale, id_col, vec_col).localCheckpoint()
    s, n, _assign = _lloyd_fit_int(qdf, k, max_iter, id_col)
    s_f, n_f = s, n

    def final(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["q"].to_numpy()).astype("int64")
            a, assign = _assign(m, s_f, n_f)
            yield pd.DataFrame(
                {
                    "cluster": assign.astype("int64"),
                    "a": a[np.arange(len(m)), assign],
                    "nj": n_f[assign],
                }
            )

    assigned = qdf.select("q").mapInPandas(
        final, "cluster long, a long, nj long"
    )
    s2 = scale * scale
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum("a").cast("double")
            / (F.count(F.lit(1)) * F.max("nj") * F.max("nj") * F.lit(s2)).cast(
                "double"
            ),
            6,
        ).alias("avg_sqdist"),
        F.round(
            F.max("a").cast("double")
            / (F.max("nj") * F.max("nj") * F.lit(s2)).cast("double"),
            6,
        ).alias("max_sqdist"),
    )


def _lloyd_fit_int(qdf: DataFrame, k: int, max_iter: int, id_col: str):
    """The shared integerized Lloyd loop over a quantized-vector frame
    (see :func:`kmeans_cluster_stats` for the exactness argument).
    Returns the fitted centroid state ``(s, n)`` (component-sums and
    counts, int64 arrays) plus the exact-integer assignment kernel."""
    import numpy as np
    import pandas as pd

    rows = qdf.orderBy(id_col).limit(4 * k).collect()
    seen: list = []
    for r in rows:
        v = tuple(r[1])
        if v not in seen:
            seen.append(v)
        if len(seen) == k:
            break
    if not seen:
        raise ValueError("cannot seed k-means from an empty corpus")
    # Runtime int64 headroom guard (round-9 ADVICE): the A statistic is
    # exact only while dim*(2*n*qmax)^2 < 2^63 with n the worst-case
    # cluster size (all rows) and qmax the MEASURED quantized magnitude
    # — numpy int64 wraps SILENTLY past that, corrupting every
    # downstream statistic, so measure and raise instead of relying on
    # the static pins alone. One codegen explode-aggregate over the
    # already-checkpointed frame. (The silhouette's DECIMAL(38) bound
    # A*n^2*1e6 < 1e38 has ~25x more row headroom than this one at any
    # scale >= 100, so int64 is always the binding check there.)
    dim = len(seen[0])
    g = (
        qdf.select(F.explode("q").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("nv"),
            F.max(F.abs(F.col("v"))).alias("qmax"),
        )
        .collect()[0]
    )
    n_rows, qmax = g["nv"] // dim, max(int(g["qmax"] or 0), 1)
    if dim * (2 * n_rows * qmax) ** 2 >= 2**63:
        max_rows = int((((2**63 - 1) // dim) ** 0.5) // (2 * qmax))
        raise ValueError(
            f"integerized Lloyd int64 headroom exceeded: {n_rows} rows at"
            f" measured |q|max={qmax} (dim {dim}) allows <= ~{max_rows}"
            " rows; lower `scale` (halving it quarters the A bound) or"
            " shard the fit"
        )
    s = np.array([list(v) for v in seen], dtype="int64")  # component sums
    n = np.ones(len(s), dtype="int64")  # member counts (seed: the vector itself)
    kk = len(s)

    def _assign(m: "np.ndarray", s_: "np.ndarray", n_: "np.ndarray"):
        # A[x, j] = sum_d (n_j*q_d - s_jd)^2  (exact int64)
        a = np.empty((len(m), kk), dtype="int64")
        for j in range(kk):
            d = n_[j] * m - s_[j]
            a[:, j] = (d * d).sum(axis=1)
        d2 = a.astype("float64") / (n_ * n_).astype("float64")
        # argmin takes the first occurrence -> lowest cluster id on ties,
        # the same total order as the oracle's (d2, j) row_number
        return a, d2.argmin(axis=1)

    for _ in range(max_iter):
        s_c, n_c = s.copy(), n.copy()

        def run(batches, s_=s_c, n_=n_c):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["q"].to_numpy()).astype("int64")
                _, assign = _assign(m, s_, n_)
                out = []
                for j in np.unique(assign):
                    members = m[assign == j]
                    out.append(
                        (int(j), len(members), members.sum(axis=0).tolist())
                    )
                yield pd.DataFrame(out, columns=["cluster", "cnt", "sums"])

        comp = (
            qdf.select("q")
            .mapInPandas(run, "cluster long, cnt long, sums array<bigint>")
            .select("cluster", "cnt", F.posexplode("sums").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.sum("cnt").alias("n"))
            .collect()
        )
        new_s, new_n = s.copy(), n.copy()
        for r in comp:
            new_s[r["cluster"], r["pos"]] = r["s"]
            new_n[r["cluster"]] = r["n"]
        # fixpoint early-exit (round 10): assignment is a deterministic
        # function of (s, n) and the update a deterministic function of
        # assignments, so an unchanged state makes every remaining
        # iteration a bit-identical no-op — on BOTH engines (the oracle's
        # unrolled CTEs replay those no-op rounds; the converged state is
        # their fixpoint, so results are unchanged). Saves the remaining
        # full Arrow corpus passes; a driver-side array compare, no job.
        converged = np.array_equal(new_s, s) and np.array_equal(new_n, n)
        s, n = new_s, new_n  # empty clusters keep their previous state
        if converged:
            break

    return s, n, _assign


# micro-unit positivity shift for the silhouette division: |s| <= 1 by
# construction, so adding 2*den keeps the numerator non-negative and
# floor == truncation on both engines (the FK_OFF pattern).
SIL_OFF = 2_000_000


def kmeans_silhouette(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster SIMPLIFIED silhouette (centroid-based, on squared
    distances) of the integerized Lloyd clustering — the cluster-quality
    read (cohesion vs separation) taken before trusting k-means labels
    for SemDeDup partitions or topic-balanced sampling.

    For each point with own-centroid statistic a = A_o/n_o^2 and
    second-best b = A_b/n_b^2 (A, n the exact-integer kernel of
    :func:`kmeans_cluster_stats`), the score s = (b - a)/max(a, b) is
    cleared of floats entirely:

        s_micro = (A_b*n_o^2 - A_o*n_b^2) * 1e6 div max(A_o*n_b^2,
                                                        A_b*n_o^2)

    in DECIMAL(38)/HUGEINT with the :data:`SIL_OFF` positivity shift
    (own is the FLOAT-argmin winner, so the exact-integer difference
    can be infinitesimally negative on float near-ties; the shift keeps
    floor == trunc). Both-zero (point on two centroids) scores 0. The
    per-cluster average is one more shifted integer division, so the
    whole statistic replays bit-identically in the unrolled-CTE oracle.
    Second-best selection uses the same (float d2, lowest j) total
    order as assignment.

    Overflow headroom: A <= dim*(2*n*q_max)^2 needs <= ~1.3e5 rows at
    scale 1000 / dim 64 / |x|<=0.6 (int64, same bound as
    kmeans_cluster_stats); A*n^2*1e6 <= ~2e34 stays inside DECIMAL(38)
    (tests pin both).

    Scale: one Arrow map pass per Lloyd iteration plus one scoring pass;
    per-point output is 4 integers, the rollup is map-combinable.
    Returns (cluster, n_points, avg_sil_micro, min_sil_micro,
    max_sil_micro) ordered by cluster.
    """
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError("silhouette needs k >= 2")
    qdf = _quantize_vectors(df, scale, id_col, vec_col).localCheckpoint()
    s, n, _assign = _lloyd_fit_int(qdf, k, max_iter, id_col)
    s_f, n_f = s, n

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["q"].to_numpy()).astype("int64")
            a, assign = _assign(m, s_f, n_f)
            d2 = a.astype("float64") / (n_f * n_f).astype("float64")
            rows = np.arange(len(m))
            d2[rows, assign] = np.inf
            second = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cluster": assign.astype("int64"),
                    "a_own": a[rows, assign],
                    "n_own": n_f[assign],
                    "a_best": a[rows, second],
                    "n_best": n_f[second],
                }
            )

    scored = qdf.select("q").mapInPandas(
        score, "cluster long, a_own long, n_own long, a_best long, n_best long"
    )
    num = (
        "CAST(a_best AS DECIMAL(38,0)) * n_own * n_own"
        " - CAST(a_own AS DECIMAL(38,0)) * n_best * n_best"
    )
    den = (
        "greatest(CAST(a_own AS DECIMAL(38,0)) * n_best * n_best,"
        " CAST(a_best AS DECIMAL(38,0)) * n_own * n_own)"
    )
    per_point = scored.select(
        "cluster",
        F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE CAST((({num}) * 1000000 + {SIL_OFF} * ({den}))"
            f" div ({den}) AS BIGINT) - {SIL_OFF} END"
        ).alias("s_micro"),
    )
    return (
        per_point.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("s_micro").alias("sum_s"),
            F.min("s_micro").alias("min_sil_micro"),
            F.max("s_micro").alias("max_sil_micro"),
        )
        .select(
            "cluster",
            "n_points",
            F.expr(
                f"CAST((sum_s + CAST({SIL_OFF} AS BIGINT) * n_points)"
                f" div n_points AS BIGINT) - {SIL_OFF}"
            ).alias("avg_sil_micro"),
            "min_sil_micro",
            "max_sil_micro",
        )
        .orderBy("cluster")
    )
