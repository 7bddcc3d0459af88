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
