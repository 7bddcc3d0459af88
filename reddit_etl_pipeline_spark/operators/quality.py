"""Data-quality operators (SURVEY.md §2.11).

Covers the reference's runtime audits and dbt schema tests:

- null audit: ``df.isna().sum().sum()`` logged per extract
  (reference ``airflow/extraction/extract-from-reddit.py:117-120``)
- uniqueness / not-null assertions: dbt ``data_tests: [unique, not_null]``
  (reference ``dbt/reddit_dbt/models/example/schema.yml:8-19``)
- corrupt-record audit: Redshift ``sys_load_error_detail`` top-10
  (reference ``s3_to_redshift.py:312-331``) mapped to PERMISSIVE-mode
  ``_corrupt_record`` accounting.

All audits are single-pass aggregates — one job, no per-column actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_counts(df: DataFrame) -> dict[str, int]:
    """Per-column null counts in ONE aggregate pass (the reference's
    eager per-column isna().sum() collapses into a single job)."""
    row = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in df.columns
        ]
    ).first()
    return row.asDict()


def total_nulls(df: DataFrame) -> int:
    """``df.isna().sum().sum()`` parity (extract-from-reddit.py:117-120)."""
    return sum(v or 0 for v in null_counts(df).values())


def duplicate_keys(df: DataFrame, key: str = "id") -> DataFrame:
    """Keys violating the dbt ``unique`` test: groupBy(key) HAVING count>1."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def assert_unique(df: DataFrame, key: str = "id") -> None:
    """dbt ``unique`` test on ``key``."""
    if not duplicate_keys(df, key).isEmpty():
        raise AssertionError(f"uniqueness violated on {key}")


def assert_not_null(df: DataFrame, key: str = "id") -> None:
    """dbt ``not_null`` test on ``key``."""
    if not df.filter(F.col(key).isNull()).isEmpty():
        raise AssertionError(f"not-null violated on {key}")


def summary_stats(df: DataFrame) -> dict:
    """Extraction-time summary logged by the reference
    (extract-from-reddit.py:236-245): mean/max of score & num_comments,
    row count — one aggregate job."""
    row = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("score").alias("avg_score"),
        F.max("score").alias("max_score"),
        F.avg("num_comments").alias("avg_comments"),
        F.max("num_comments").alias("max_comments"),
    ).first()
    return row.asDict()


def dq_report(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """Rule-based data-quality report (dbt-test / Great-Expectations
    shape): ``rules`` maps rule name -> boolean Column that must hold per
    row. Returns one row per rule: (rule, n_rows, n_violations,
    violation_rate).

    Scale shape: ONE aggregate pass computes every rule's violation
    count simultaneously (map-side combined — a rule per column, not a
    scan per rule); the per-rule rows come from a stack() unpivot of the
    single 1-row aggregate. Adding a rule adds a counter, not a scan.

    Rule names are validated as identifiers ([A-Za-z0-9_]+): they are
    interpolated into the stack() SQL string and column aliases, where a
    quote or space would break — or inject into — the expression."""
    import re

    bad = [n for n in rules if not re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad:
        raise ValueError(
            f"dq_report rule names must match [A-Za-z0-9_]+, got: {bad}"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(~cond, 1).otherwise(0)).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __v_{name}" for name in rules
    )
    return one.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def categorical_profile(named_cols) -> DataFrame:
    """Cardinality / concentration profile of categorical columns — the
    data-profiling read (dictionary-encodability, partition-key and
    groupBy-fanout planning) taken once per ingest at 100 TB.

    ``named_cols`` is a list of (label, df, col); for each column the
    profile emits row count, distinct count, the modal frequency and its
    share, and the Gini impurity 1 - sum((c/N)^2) — an exact rational,
    computed as (N^2 - sum(c^2)) * 1e6 div N^2 in DECIMAL(38)/HUGEINT
    (no float ever enters; N <= ~5e15 before N^2 * 1e6 leaves
    DECIMAL(38)). NULL is its own category on both engines.

    Scale: one map-combinable groupBy per column plus a one-row fold;
    the union is |columns| rows. Returns
    (column, n, n_distinct, top1_n, top1_share_micro, gini_micro)
    ordered by column label.
    """
    out = None
    for label, df, col in named_cols:
        counts = df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        prof = profile_from_counts(counts, label)
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("column")


def profile_from_counts(counts: DataFrame, label: str) -> DataFrame:
    """The one-row profile fold over a finished (v, c) per-value count
    table — shared by :func:`categorical_profile` and the streaming twin
    (per-value counts obey the SUM merge law, so micro-batch partials
    sum to the counts of the union and the fold is batch-side)."""
    return counts.agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top1_n"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_c2"),
        ).select(
            F.lit(label).alias("column"),
            F.col("n").cast("long").alias("n"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("top1_n").cast("long").alias("top1_n"),
            F.expr(
                "CAST((top1_n * CAST(1000000 AS DECIMAL(38,0))) div n"
                " AS BIGINT)"
            ).alias("top1_share_micro"),
            F.expr(
                "CAST(((CAST(n AS DECIMAL(38,0)) * n - sum_c2)"
                " * 1000000) div (CAST(n AS DECIMAL(38,0)) * n)"
                " AS BIGINT)"
            ).alias("gini_micro"),
        )


def categorical_profile_oracle_sql(named_cols) -> str:
    """DuckDB replay of :func:`categorical_profile`;
    ``named_cols`` is a list of (label, table, col)."""
    parts = []
    for label, table, col in named_cols:
        parts.append(f"""
SELECT '{label}' AS "column",
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(c) AS BIGINT) AS top1_n,
       CAST((max(c) * 1000000) // sum(c) AS BIGINT) AS top1_share_micro,
       CAST(((CAST(sum(c) AS HUGEINT) * sum(c) - sum(CAST(c AS HUGEINT) * c))
             * 1000000) // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT)
         AS gini_micro
FROM (SELECT {col} AS v, count(*) AS c FROM {table} GROUP BY {col})
""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def fk_integrity_audit(relations) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared FK (child table/col -> parent table/col), the child row
    count and the ORPHAN count (child keys with no parent) — the ingest
    gate that catches a truncated dim load before every downstream join
    silently drops rows.

    ``relations`` is a list of (label, child_df, child_col, parent_df,
    parent_col). NULL child keys count as orphans (a NULL FK never
    joins). Each audit is one distinct-parent anti-join; counts are
    exact BIGINTs. Returns (relation, n_child, n_orphans) ordered by
    label.

    Scale: the anti-join shuffles on the key; the parent side collapses
    to distinct keys first (dims broadcast when small)."""
    out = None
    for label, child, ccol, parent, pcol in relations:
        keys = parent.select(F.col(pcol).alias("__pk")).distinct()
        c = child.select(F.col(ccol).alias("__fk"))
        # ONE pass: left-join against the distinct parent keys and count
        # rows + unmatched rows in the same aggregate (a NULL FK never
        # joins, so it lands in the orphan count by construction)
        prof = (
            c.join(keys, c["__fk"] == keys["__pk"], "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("__pk").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(label).alias("relation"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
            )
        )
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("relation")


def fk_integrity_oracle_sql(relations) -> str:
    """DuckDB replay of :func:`fk_integrity_audit`; ``relations`` is a
    list of (label, child_table, child_col, parent_table, parent_col)."""
    parts = []
    for label, ct, cc, pt, pc in relations:
        parts.append(f"""
SELECT '{label}' AS relation,
       CAST((SELECT count(*) FROM {ct}) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM {ct}
             WHERE {cc} IS NULL
                OR {cc} NOT IN (SELECT {pc} FROM {pt}
                                WHERE {pc} IS NOT NULL))
            AS BIGINT) AS n_orphans
""")
    return " UNION ALL ".join(parts) + " ORDER BY relation"


def numeric_profile(named_cols) -> DataFrame:
    """Numeric-column profile in exact integer micros — the numeric
    complement of :func:`categorical_profile`: row/null/zero/negative
    counts plus min/max/sum of round(x * 1e6) (one double product +
    half-away-from-zero round per row, identical in both engines; the
    sums are then order-independent BIGINTs).

    ``named_cols`` is a list of (label, df, col). Returns
    (column, n, n_null, n_zero, n_negative, min_micro, max_micro,
    sum_micro) ordered by label. One map-combinable aggregate per
    column."""
    out = None
    for label, df, col in named_cols:
        micro = F.expr(f"CAST(round({col} * 1000000) AS BIGINT)")
        prof = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col(col).isNull(), 1).otherwise(0)
            ).alias("n_null"),
            F.sum(F.when(F.col(col) == 0, 1).otherwise(0)).alias("n_zero"),
            F.sum(F.when(F.col(col) < 0, 1).otherwise(0)).alias(
                "n_negative"
            ),
            F.min(micro).alias("min_micro"),
            F.max(micro).alias("max_micro"),
            F.coalesce(F.sum(micro), F.lit(0)).alias("sum_micro"),
        ).select(
            F.lit(label).alias("column"),
            F.col("n").cast("long").alias("n"),
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_zero").cast("long").alias("n_zero"),
            F.col("n_negative").cast("long").alias("n_negative"),
            "min_micro",
            "max_micro",
            F.col("sum_micro").cast("long").alias("sum_micro"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("column")


def numeric_profile_oracle_sql(named_cols) -> str:
    """DuckDB replay of :func:`numeric_profile`; ``named_cols`` is a
    list of (label, table, col)."""
    parts = []
    for label, table, col in named_cols:
        micro = f"CAST(round({col} * 1000000) AS BIGINT)"
        parts.append(f"""
SELECT '{label}' AS "column",
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(sum(CASE WHEN {col} = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(sum(CASE WHEN {col} < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       min({micro}) AS min_micro,
       max({micro}) AS max_micro,
       CAST(coalesce(sum({micro}), 0) AS BIGINT) AS sum_micro
FROM {table}
""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'
