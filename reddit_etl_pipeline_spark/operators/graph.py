"""Graph analytics over edge DataFrames.

Connected components (min-label propagation) lives in operators/dedup.py
where near-dup clustering consumes it; this module carries the other
classic iterative graph op — PageRank — in the standard Spark
formulation: ranks as a (node, rank) DataFrame, one contribution
shuffle per iteration.

Scale design (100 TB):
- Per iteration: ranks ⋈ out-degrees (broadcast when the node table is
  small, shuffle otherwise), explode contributions along edges, one
  map-side-combined groupBy(dst). Iterations are driver-coordinated but
  each is a fully distributed pass — the standard Pregel-style loop.
- ``localCheckpoint`` every few rounds cuts the lineage chain that would
  otherwise grow linearly with iterations (same discipline as
  connected_components in dedup.py).
- Dangling nodes (no out-edges) leak rank mass by design in the simple
  formulation; ``redistribute_dangling=True`` adds the textbook
  correction (dangling mass spread uniformly) at the cost of one extra
  tiny aggregate per iteration.

No counterpart in the reference (pandas/psycopg2 pipeline); part of the
engine's iterative-algorithm surface alongside k-means and CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "degree_stats"]


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node (node, out_degree, in_degree) — two map-side-combined
    aggs + one outer join on the node id."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .na.fill({"out_degree": 0, "in_degree": 0})
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    redistribute_dangling: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over a directed edge list: returns (node, rank) with
    ranks summing to the node count (uniform start = 1.0 each).

    Deterministic given a partitioning; across partitionings ranks agree
    to float tolerance (contribution sums reduce in partition order).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    pinned: list[DataFrame] = []
    for i in range(iters):
        with_deg = ranks.join(out_deg, "node", "left")
        if redistribute_dangling:
            # persist: the dangling-mass aggregate and the contribution
            # join both consume with_deg — uncached, the aggregate would
            # recompute the whole rank lineage (every join since the last
            # checkpoint) as a second full job per iteration. Kept pinned
            # until the next localCheckpoint cuts the lineage (unpersisting
            # sooner would force the contribution join to recompute it).
            with_deg = with_deg.persist()
            pinned.append(with_deg)
            dangling = (
                with_deg.filter(F.col("out_degree").isNull())
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
        else:
            dangling = 0.0
        contribs = (
            with_deg.join(edges, F.col("node") == F.col(src))
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        base = (1.0 - damping) + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
            for df in pinned:
                df.unpersist()
            pinned.clear()
    ranks = ranks.localCheckpoint()
    for df in pinned:
        df.unpersist()
    return ranks
