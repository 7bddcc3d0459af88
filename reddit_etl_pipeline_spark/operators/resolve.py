"""Entity resolution / fuzzy join: match dirty records to a clean
reference by edit distance, with wildcard-position blocking so the join
never goes all-pairs — and never hot-blocks on shared prefixes.

The reference has no ER surface; this is part of the beyond-reference
large-scale family (a training-data pipeline dedups entities — authors,
sources, URLs — not just documents). Spark-first shape:

- **Blocking** by masked variants (the FastSS / PassJoin deletion-
  neighborhood idea, adapted to substitutions): every record emits one
  key per size-``max_dist`` set of positions, with those positions
  replaced by ``*``. Two equal-length strings differ in at most
  ``max_dist`` aligned positions **iff** they share a masked variant, so
  the equi-join on variant keys is EXACT candidate generation — complete
  AND sound for the aligned-substitution (Hamming) model. Crucially the
  keys carry the *unmasked remainder* of the string, so a low-entropy
  shared prefix ("Customer#…", "http://…") cannot collapse the relation
  into one block: a block holds only strings identical outside the
  masked positions (≤ alphabet^max_dist members). The first cut of this
  operator used pigeonhole segment blocking instead and its constant
  prefix segment put ALL 15 k names in one block — a 45 M-pair
  single-partition verify at sf0.1; skew-robustness is why the variant
  scheme replaced it.
- **Verification** with JVM-side ``levenshtein`` (wholestage codegen; a
  plain DP both engines implement identically, so the oracle replays it
  with DuckDB's ``levenshtein``). Blocking already guarantees
  Hamming ≤ max_dist; levenshtein (≤ Hamming) supplies the reported
  distance.
- **Resolution**: per dirty record, one map-side-combinable
  ``min(struct(distance, clean_id))`` — best match, total order, no
  window over the candidate set.
- **Duplicate collapse** (round 7): both sides dedup to DISTINCT names
  BEFORE variant generation (clean side carries count + min-id so the
  fan-back is exact), because identical strings meet in every shared
  block and candidate volume grows ×m² with duplicate multiplicity m —
  measured ~33× slower on a 10× dup-heavy replica before the collapse.
  Results fan back to records with one equi-join on the name.

Matching model: aligned substitutions over identifier-like strings
(cross-length matches are out of scope — a length change is a different
entity for fixed-format keys). Keys per record are C(len, max_dist):
fine for identifiers (len 18, d=2 → 153), quadratic for long strings —
``max_len`` guards against feeding documents through this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: C(len, 2) keys per record grows quadratically; identifiers only.
MAX_NAME_LEN = 128
MAX_DISTINCT_LENGTHS = 1024


def _mask_sql(name: str) -> str:
    """Masked-variant SQL shared by both join sides (columns ``i`` <=
    ``j`` from the broadcast pair table; ``i = j`` masks one position):
    positions i and j replaced by '*', everything else verbatim."""
    return (
        f"concat(substr({name}, 1, i - 1), '*', "
        f"substr({name}, i + 1, greatest(j - i - 1, 0)), '*', "
        f"substr({name}, j + 1))"
    )


#: broadcast pair-table bound: per-length C(len,2) is fine, but many
#: DISTINCT lengths × C(128,2)=8128 could pile up a 100 MB+ broadcast
MAX_PAIR_ROWS = 1_000_000


def _position_pairs(spark, lengths: list[int], max_dist: int) -> DataFrame:
    """Broadcast (nlen, i, j) table: per observed string length, every
    size-``max_dist`` position subset (i = j when max_dist = 1); lengths
    shorter than max_dist get the (0, 0) sentinel (full mask — any
    equal-length string matches)."""
    rows = []
    for n in lengths:
        if n < max_dist:
            rows.append((n, 0, 0))
        elif max_dist == 1:
            rows += [(n, i, i) for i in range(1, n + 1)]
        else:
            rows += [
                (n, i, j)
                for i in range(1, n + 1)
                for j in range(i + 1, n + 1)
            ]
        if len(rows) > MAX_PAIR_ROWS:
            raise ValueError(
                f"fuzzy_resolve: position-pair table exceeds "
                f"{MAX_PAIR_ROWS} rows ({len(lengths)} distinct lengths "
                f"up to {max(lengths)}) — not an identifier-shaped input"
            )
    # pandas/Arrow local relation: the tuple form re-evaluates through a
    # Python-RDD worker round trip at every action that broadcasts it —
    # and this table is broadcast into BOTH variant-generation sides
    # (round 10; same values, Arrow deserializes JVM-side)
    import pandas as pd

    return F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["nlen", "i", "j"]),
            "nlen INT, i INT, j INT",
        )
    )


def fuzzy_resolve(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "dirty_id",
    clean_id: str = "clean_id",
    name_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """Resolve each dirty record to its best clean match within
    ``max_dist`` aligned substitutions. Returns (dirty_id, resolved_id,
    distance, n_candidates); dirty records with no candidate are absent
    (left-join downstream if you need misses). ``max_dist`` ∈ {1, 2}
    (the variant count is C(len, d); higher d belongs to a q-gram
    pipeline, not this one)."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    spark = dirty.sparkSession

    # observed lengths drive the broadcast pair table — bounded collect
    # with loud caps (identifier-like keys, not documents)
    lens = [
        r["n"]
        for r in (
            dirty.select(F.length(name_col).alias("n"))
            .unionAll(clean.select(F.length(name_col).alias("n")))
            .filter(F.col("n").isNotNull())
            .distinct()
            .limit(MAX_DISTINCT_LENGTHS + 1)
            .collect()
        )
    ]
    if len(lens) > MAX_DISTINCT_LENGTHS:
        raise ValueError(
            f"fuzzy_resolve: more than {MAX_DISTINCT_LENGTHS} distinct "
            "name lengths — this input does not look like identifiers"
        )
    too_long = [n for n in lens if n > MAX_NAME_LEN]
    if too_long:
        raise ValueError(
            f"fuzzy_resolve: name length {max(too_long)} exceeds "
            f"MAX_NAME_LEN={MAX_NAME_LEN} (C(len,{max_dist}) keys per "
            "record); use q-gram/minhash blocking for long strings"
        )
    pairs = _position_pairs(spark, lens, max_dist)

    # Collapse BOTH sides to DISTINCT names before variant generation
    # (round-7 fix): identical strings share every variant key and meet
    # in every block, so candidate volume grows ×m² when a name appears
    # m times (measured ~100 s at a 10× dup-heavy replica vs 3 s at 1×).
    # Resolving distinct-vs-distinct keeps candidates proportional to
    # distinct names; the carriers make the fan-back exact:
    #   - min_c_key: within one clean NAME the distance is constant, so
    #     min(struct(distance, c_key)) over clean IDs ==
    #     min(struct(distance, min_c_key)) over clean names;
    #   - c_cnt: n_candidates (verified clean IDs) == Σ c_cnt over
    #     verified clean names.
    dnames = dirty.select(F.col(name_col).alias("d_name")).distinct()
    cnames = clean.groupBy(F.col(name_col).alias("c_name")).agg(
        F.min(clean_id).alias("min_c_key"),
        F.count(F.lit(1)).alias("c_cnt"),
    )

    def blocked(df, side, carry=()):
        named = df.select(
            f"{side}_name",
            F.length(f"{side}_name").alias("nlen"),
            *carry,
        )
        return named.join(pairs, "nlen").select(
            f"{side}_name",
            *carry,
            F.concat_ws(
                "|",
                F.col("nlen").cast("string"),
                F.col("i").cast("string"),
                F.col("j").cast("string"),
                F.when(F.col("i") == 0, F.lit("ALL")).otherwise(
                    F.expr(_mask_sql(f"{side}_name"))
                ),
            ).alias("block"),
        )

    d = blocked(dnames, "d")
    c = blocked(cnames, "c", carry=("min_c_key", "c_cnt"))
    # distinct on the name pair dedups multi-block meetings; min_c_key
    # and c_cnt are functionally dependent on c_name
    cands = (
        d.join(c, "block")
        .select("d_name", "c_name", "min_c_key", "c_cnt")
        .distinct()
    )
    verified = cands.select(
        "d_name",
        "min_c_key",
        "c_cnt",
        F.levenshtein("d_name", "c_name").alias("distance"),
    ).filter(F.col("distance") <= max_dist)
    resolved_names = verified.groupBy("d_name").agg(
        F.min(F.struct("distance", "min_c_key")).alias("best"),
        F.sum("c_cnt").alias("n_candidates"),
    )
    # fan results back to every dirty record with ONE equi-join on name
    return (
        dirty.select(
            F.col(dirty_id).alias("dirty_id"),
            F.col(name_col).alias("d_name"),
        )
        .join(resolved_names, "d_name")
        .select(
            "dirty_id",
            F.col("best.min_c_key").alias("resolved_id"),
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
