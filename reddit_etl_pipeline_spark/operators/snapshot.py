"""Corpus snapshot diff: classify every document across two snapshots
as added / removed / changed / unchanged and roll the counts up per
source — the data-ops audit run between ingest cycles ("what did this
crawl actually change?") and the precondition for incremental
reprocessing (only `added`+`changed` re-enter the pipeline).

Scale design: each side projects (id, source, fingerprint) BEFORE the
full-outer join, so document text never crosses an Exchange (the CDC
hash-before-join rule) — the join shuffles 8-byte fingerprints keyed by
id. Fingerprint = xxhash64(text), NULL for NULL text; `unchanged`
requires null-safe fingerprint equality, so NULL→NULL is unchanged and
NULL→text is changed. A 2^-64 hash collision would classify a changed
doc as unchanged — the standard fingerprint-diff trade, and the DuckDB
oracle replays the SAME xxhash64 (via xxh64_sql), so engine and oracle
can never split on one.

Reference parity: the reference re-loads each day's batch whole and has
no snapshot reasoning; this belongs to the engine's incremental-ops
family (sketch store, incremental dedup, CDC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source diff counts between two snapshots:
    (source, n_added, n_removed, n_changed, n_unchanged). A doc's
    source comes from the NEW snapshot when present, else the old
    (removed docs keep their last-known source)."""
    fp = F.when(
        F.col(text_col).isNotNull(), F.xxhash64(text_col)
    )  # NULL fingerprint for NULL text
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("o_src"),
        fp.alias("o_fp"),
        F.lit(1).alias("o_present"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("n_src"),
        fp.alias("n_fp"),
        F.lit(1).alias("n_present"),
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("o_present").isNull(), F.lit("added"))
        .when(F.col("n_present").isNull(), F.lit("removed"))
        .when(F.col("o_fp").eqNullSafe(F.col("n_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    tagged = j.select(
        F.coalesce("n_src", "o_src").alias("source"),
        status.alias("status"),
    )
    return tagged.groupBy("source").agg(
        F.sum((F.col("status") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("status") == "removed").cast("long")).alias("n_removed"),
        F.sum((F.col("status") == "changed").cast("long")).alias("n_changed"),
        F.sum((F.col("status") == "unchanged").cast("long")).alias(
            "n_unchanged"
        ),
    )


def snapshot_diff_oracle_sql(
    old_sql: str, new_sql: str, id_col: str = "doc_id"
) -> str:
    """DuckDB replay: the same xxhash64 fingerprints (xxh64_sql over the
    DISTINCT texts of both sides — bit-identical to Spark's), the same
    full-outer null-safe classification, the same per-source rollup.
    ``old_sql`` / ``new_sql`` must select ({id_col}, source, text)."""
    from .. import xxh64_sql as X

    text_hash = X.render_select(
        X.str_hash_cols("text", "th"), ["th"], "dtexts", passthrough=["text"]
    )
    return f"""
WITH oldsnap AS MATERIALIZED ({old_sql}),
newsnap AS MATERIALIZED ({new_sql}),
dtexts AS MATERIALIZED (
  SELECT DISTINCT text FROM (
    SELECT text FROM oldsnap WHERE text IS NOT NULL
    UNION ALL SELECT text FROM newsnap WHERE text IS NOT NULL
  )
),
th AS MATERIALIZED ({text_hash}),
o AS MATERIALIZED (
  SELECT s.{id_col} AS _id, s.source AS o_src,
         {X.signed('h.th')} AS o_fp, 1 AS o_present
  FROM oldsnap s LEFT JOIN th h ON h.text = s.text
),
n AS MATERIALIZED (
  SELECT s.{id_col} AS _id, s.source AS n_src,
         {X.signed('h.th')} AS n_fp, 1 AS n_present
  FROM newsnap s LEFT JOIN th h ON h.text = s.text
),
tagged AS MATERIALIZED (
  SELECT coalesce(n.n_src, o.o_src) AS source,
         CASE WHEN o.o_present IS NULL THEN 'added'
              WHEN n.n_present IS NULL THEN 'removed'
              WHEN o.o_fp IS NOT DISTINCT FROM n.n_fp THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN n ON o._id = n._id
)
SELECT source,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged
FROM tagged GROUP BY source
"""


def edge_churn_by_month(li: DataFrame, orders: DataFrame) -> DataFrame:
    """Month-over-month churn of the co-purchase graph: how much of the
    relationship structure ("bought together") survives from one order
    month to the next — the snapshot-diff idea applied to EDGES instead
    of documents, and the staleness read behind recommendation-model
    refresh cadence (a graph whose edges churn 40%/month needs monthly
    retrains; one that keeps 95% doesn't).

    Months are the linear index year*12 + month - 1 of o_orderdate
    (exact integer, identical both engines); a month's edge set is the
    distinct co-purchase (lo, hi) pairs of orders placed that month.
    For each consecutive present month pair: kept = |E_m intersect
    E_{m+1}| via ONE (lo, hi) equi-join with the m+1 shift, and added /
    removed fall out of the totals arithmetically (no second join);
    churn_micro = removed * 1e6 div total_m.

    Scale: the per-month pair generation is the same orderkey-keyed
    self-join as the co-purchase builder (month rides along); the kept
    join and totals are key equi-shuffles. Returns (month_idx,
    total_m, total_next, kept, added, removed, churn_micro) ordered by
    month."""
    mcol = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast(
        "long"
    )
    lim = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .join(
            orders.select(
                F.col("o_orderkey"), mcol.alias("m")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_partkey", "m")
    )
    a, b = lim.alias("a"), lim.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.m").alias("m"),
            F.col("a.l_partkey").alias("lo"),
            F.col("b.l_partkey").alias("hi"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    totals = edges.groupBy("m").agg(F.count(F.lit(1)).alias("total"))
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    kept = (
        e1.join(
            e2,
            (F.col("e1.lo") == F.col("e2.lo"))
            & (F.col("e1.hi") == F.col("e2.hi"))
            & (F.col("e2.m") == F.col("e1.m") + 1),
        )
        .groupBy(F.col("e1.m").alias("m"))
        .agg(F.count(F.lit(1)).alias("kept"))
    )
    t1, t2 = totals.alias("t1"), totals.alias("t2")
    return (
        t1.join(t2, F.col("t2.m") == F.col("t1.m") + 1)
        .join(kept, F.col("t1.m") == kept["m"], "left")
        .select(
            F.col("t1.m").alias("month_idx"),
            F.col("t1.total").alias("total_m"),
            F.col("t2.total").alias("total_next"),
            F.coalesce(kept["kept"], F.lit(0)).alias("kept"),
            (F.col("t2.total") - F.coalesce(kept["kept"], F.lit(0))).alias(
                "added"
            ),
            (F.col("t1.total") - F.coalesce(kept["kept"], F.lit(0))).alias(
                "removed"
            ),
        )
        .withColumn(
            "churn_micro",
            F.expr("(removed * CAST(1000000 AS BIGINT)) div total_m"),
        )
        .orderBy("month_idx")
    )


def edge_churn_oracle_sql() -> str:
    """DuckDB replay of :func:`edge_churn_by_month`."""
    return """
WITH lim AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, l.l_partkey,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS m
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), edges AS MATERIALIZED (
  SELECT DISTINCT a.m, a.l_partkey AS lo, b.l_partkey AS hi
  FROM lim a JOIN lim b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), totals AS MATERIALIZED (
  SELECT m, count(*) AS total FROM edges GROUP BY m
), kept AS MATERIALIZED (
  SELECT e1.m, count(*) AS kept
  FROM edges e1 JOIN edges e2
    ON e2.lo = e1.lo AND e2.hi = e1.hi AND e2.m = e1.m + 1
  GROUP BY e1.m
)
SELECT CAST(t1.m AS BIGINT) AS month_idx,
       CAST(t1.total AS BIGINT) AS total_m,
       CAST(t2.total AS BIGINT) AS total_next,
       CAST(coalesce(k.kept, 0) AS BIGINT) AS kept,
       CAST(t2.total - coalesce(k.kept, 0) AS BIGINT) AS added,
       CAST(t1.total - coalesce(k.kept, 0) AS BIGINT) AS removed,
       CAST(((t1.total - coalesce(k.kept, 0)) * 1000000) // t1.total
            AS BIGINT) AS churn_micro
FROM totals t1
JOIN totals t2 ON t2.m = t1.m + 1
LEFT JOIN kept k ON k.m = t1.m
ORDER BY month_idx
"""
