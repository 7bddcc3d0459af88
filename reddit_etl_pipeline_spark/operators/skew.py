"""Skew-mitigation utilities for shuffles at 100 TB.

AQE (``spark.sql.adaptive.skewJoin``) splits oversized shuffle-join
partitions at runtime and is the first line of defense (enabled by the
session factory). These helpers cover the cases AQE can't fix:

- ``salted_join``: a hot KEY on the probe side (billions of rows for one
  key) joined against a build side too big to broadcast. Salting splits
  each hot key's rows across ``n_salts`` reducers by replicating the
  build side per salt — turning one straggler task into n even ones.
- ``two_phase_count`` / ``two_phase_agg``: aggregations whose per-key
  cardinality is so skewed that even partial aggregation leaves one
  reducer hot (rare — partial agg usually suffices; kept for the
  distinct-heavy cases where it doesn't, e.g. countDistinct on a hot
  group).

Both are deterministic (hash-based salts, no rand()) so results are
reproducible and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's non-key
    columns (falls back to a per-partition counter pattern if none)."""
    if cols:
        return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    return F.pmod(F.spark_partition_id(), F.lit(n_salts)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-split hot keys.

    Left rows get a deterministic salt from their non-key columns; the
    right side is replicated once per salt value (explode of a literal
    range — n_salts x |right| rows, so use only when right is modest but
    above broadcast size). The join key becomes (key, salt): each hot
    key's rows now spread over n_salts shuffle partitions.
    """
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti", "cross"):
        # right/full outer would emit each unmatched RIGHT row once per
        # salt replica — n_salts duplicates. Flip the join instead.
        raise ValueError(
            f"salted_join replicates the right side; how={how!r} would "
            "duplicate unmatched right rows (use inner/left/semi/anti)"
        )
    non_key = [c for c in left.columns if c != on]
    lsalted = left.withColumn("__salt", _salt_col(non_key, n_salts))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lsalted.join(rsalted, [on, "__salt"], how)
    return out.drop("__salt")


def two_phase_count(
    df: DataFrame, keys: list[str], n_salts: int = 32
) -> DataFrame:
    """COUNT(*) per key with an explicit salt phase: count per (key, salt)
    first (spreads a hot key over n_salts reducers), then sum the partial
    counts per key (n_salts rows per key — trivial)."""
    other = [c for c in df.columns if c not in keys]
    salted = df.withColumn("__salt", _salt_col(other, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def two_phase_distinct_count(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 32
) -> DataFrame:
    """COUNT(DISTINCT value) per key without one reducer holding a hot
    key's whole distinct set: dedup on (key, salt-of-value, value) —
    each value lands on exactly one salt, so distinct-ness is preserved —
    then count per key."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int")
    )
    deduped = salted.select(*keys, "__salt", value).distinct()
    return deduped.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))


def join_skew_stats(df, key: str, top_n: int = 10):
    """Join-key skew diagnostic: per-key degree, the SELF-JOIN pair
    volume each key would produce (deg^2 — the quantity that explodes a
    skewed shuffle join), and its share of the total pair volume in
    exact micro-units — the planner read (alongside the degree
    histogram) taken BEFORE choosing broadcast vs salted vs sort-merge
    for a key at 100 TB.

    All integers: deg and pairs are BIGINTs (deg <= 2^31 before deg^2
    could overflow), the total comes back as a 1-row driver scalar and
    is injected as a literal (the repo's scalar idiom — never a global
    window, never a 1-row nested-loop join), share = pairs * 1e6 div
    total. Returns the top ``top_n`` keys by (pairs DESC, key ASC) —
    totally ordered — as (key, deg, pairs, share_micro).

    Scale: one map-combinable groupBy(key) plus a scalar tree-aggregate;
    the per-key frame is |distinct keys| rows, the output ``top_n`` via
    TakeOrdered.
    """
    deg = df.groupBy(key).agg(F.count(F.lit(1)).alias("deg"))
    # |distinct keys| rows; checkpoint so the scalar tree-aggregate and
    # the TakeOrdered main plan share ONE scan+groupBy instead of
    # re-running the degree aggregate per action (round-9 ADVICE)
    pairs = deg.select(
        key, "deg", (F.col("deg") * F.col("deg")).alias("pairs")
    ).localCheckpoint()
    total = pairs.agg(F.sum("pairs")).collect()[0][0] or 1
    return (
        pairs.select(
            key,
            "deg",
            "pairs",
            F.expr(
                f"(pairs * CAST(1000000 AS BIGINT)) div CAST({int(total)} AS BIGINT)"
            ).alias("share_micro"),
        )
        .orderBy(F.desc("pairs"), F.col(key))
        .limit(top_n)
    )


def join_skew_oracle_sql(table: str, key: str, top_n: int = 10) -> str:
    """DuckDB replay of :func:`join_skew_stats`."""
    return f"""
WITH deg AS MATERIALIZED (
  SELECT {key}, count(*) AS deg FROM {table} GROUP BY {key}
), p AS MATERIALIZED (
  SELECT {key}, deg, deg * deg AS pairs FROM deg
)
SELECT {key}, CAST(deg AS BIGINT) AS deg, CAST(pairs AS BIGINT) AS pairs,
       CAST((pairs * 1000000) // (SELECT sum(pairs) FROM p) AS BIGINT)
         AS share_micro
FROM p
ORDER BY pairs DESC, {key}
LIMIT {top_n}
"""
