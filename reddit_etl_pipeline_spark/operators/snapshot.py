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
