"""Entity resolution / fuzzy join: match dirty records to a clean
reference by edit distance, with pigeonhole blocking so the join never
goes all-pairs.

The reference has no ER surface; this is part of the beyond-reference
large-scale family (a training-data pipeline dedups entities — authors,
sources, URLs — not just documents). Spark-first shape:

- **Blocking** by the pigeonhole principle (the same guarantee the
  SimHash blocks use): split each name into ``max_dist + 1`` contiguous
  segments — any match within ``max_dist`` substitutions leaves at least
  one segment untouched, so candidates are exactly the pairs agreeing on
  (segment index, segment value). That's an equi-join on a bounded key,
  not a cartesian product; segment length shrinks as names grow, keeping
  blocks small. (Substitution-only is the right model for fixed-width
  identifiers; general indels would need q-gram blocking on top.)
- **Verification** with JVM-side ``levenshtein`` (wholestage codegen; a
  plain DP both engines implement identically, so the oracle replays it
  with DuckDB's ``levenshtein``).
- **Resolution**: per dirty record, one map-side-combinable
  ``min(struct(distance, clean_id))`` — best match, total order, no
  window over the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_resolve(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "dirty_id",
    clean_id: str = "clean_id",
    name_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """Resolve each dirty record to its best clean match within
    ``max_dist`` substitutions. Returns (dirty_id, resolved_id, distance,
    n_candidates); dirty records with no candidate are absent (left-join
    downstream if you need misses).

    Both inputs must carry ``name_col``. Matching model: equal-length
    substitution distance for blocking completeness (the pigeonhole
    guarantee needs aligned segments); verification uses full
    levenshtein, so unequal-length candidates that happen to share a
    segment still verify correctly."""
    n_seg = max_dist + 1

    def blocked(df, id_col, side):
        arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("seg_idx"),
                    # integer division for the boundaries — bit-identical
                    # in Spark (div) and DuckDB (//), no float rounding
                    F.expr(
                        f"substr({name_col},"
                        f" 1 + (length({name_col}) * {i}) div {n_seg},"
                        f" (length({name_col}) * {i + 1}) div {n_seg}"
                        f" - (length({name_col}) * {i}) div {n_seg})"
                    ).alias("seg_val"),
                )
                for i in range(n_seg)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{side}_key"),
            F.col(name_col).alias(f"{side}_name"),
            F.explode(arr).alias("s"),
        ).select(
            f"{side}_key",
            f"{side}_name",
            "s.seg_idx",
            # block on length too: the pigeonhole argument is per-length,
            # and it keeps a short segment from colliding across widths
            F.concat_ws(
                "|", F.length(f"{side}_name").cast("string"), F.col("s.seg_val")
            ).alias("block"),
        )

    d = blocked(dirty, dirty_id, "d")
    c = blocked(clean, clean_id, "c")
    cands = (
        d.join(c, ["seg_idx", "block"])
        .select("d_key", "d_name", "c_key", "c_name")
        .distinct()
    )
    verified = cands.select(
        "d_key",
        "c_key",
        F.levenshtein("d_name", "c_name").alias("distance"),
    ).filter(F.col("distance") <= max_dist)
    return (
        verified.groupBy("d_key")
        .agg(
            F.min(F.struct("distance", "c_key")).alias("best"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .select(
            F.col("d_key").alias("dirty_id"),
            F.col("best.c_key").alias("resolved_id"),
            # levenshtein is IntegerType; BIGINT at the query boundary
            F.col("best.distance").cast("long").alias("distance"),
            "n_candidates",
        )
    )


def corrupt_names(
    df: DataFrame, id_col: str, name_col: str = "name", every: int = 5
) -> DataFrame:
    """Deterministic dirty twin of a reference relation: every
    ``every``-th record (by id) gets ONE substitution — the character at
    position ``10 + id % 8`` becomes '#' — the ground-truth-known
    corruption the resolution tests and oracle replay. Output:
    (dirty_id = id, name = corrupted)."""
    pos = F.expr(f"10 + {id_col} % 8")
    corrupted = F.concat(
        F.expr(f"substr({name_col}, 1, 10 + {id_col} % 8 - 1)"),
        F.lit("#"),
        F.expr(f"substr({name_col}, 10 + {id_col} % 8 + 1)"),
    )
    return df.filter(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("dirty_id"),
        F.when(F.length(name_col) >= pos, corrupted)
        .otherwise(F.col(name_col))
        .alias("name"),
    )
