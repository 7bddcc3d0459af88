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


def k_anonymity_audit(configs, k: int = 5) -> DataFrame:
    """Privacy-risk audit before a data release: for each
    quasi-identifier (QI) combination, how many equivalence groups fall
    under the k-anonymity floor, how many ROWS sit in those re-
    identifiable groups, and the worst l-diversity (distinct sensitive
    values in a group — a group can be k-large yet reveal the sensitive
    attribute if all members share it).

    ``configs`` is a list of (label, df, [qi_cols], sensitive_col);
    all outputs are exact BIGINTs from one groupBy + one fold per
    config. Returns (qi, n_groups, n_rows, n_groups_lt_k,
    n_rows_at_risk, min_group_size, min_l_diversity) ordered by label.

    Scale: the QI groupBy is map-combinable; the fold is one row per
    config. The audit never materializes the groups themselves."""
    out = None
    for label, df, qi_cols, sensitive in configs:
        g = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct(F.col(sensitive)).alias("ldiv"),
        )
        prof = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("sz").alias("n_rows"),
            F.sum(F.when(F.col("sz") < k, 1).otherwise(0)).alias(
                "n_groups_lt_k"
            ),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(
                "n_rows_at_risk"
            ),
            F.min("sz").alias("min_group_size"),
            F.min("ldiv").alias("min_l_diversity"),
        ).select(
            F.lit(label).alias("qi"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_groups_lt_k").cast("long").alias("n_groups_lt_k"),
            F.col("n_rows_at_risk").cast("long").alias("n_rows_at_risk"),
            F.col("min_group_size").cast("long").alias("min_group_size"),
            F.col("min_l_diversity").cast("long").alias("min_l_diversity"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("qi")


def k_anonymity_oracle_sql(configs, k: int = 5) -> str:
    """DuckDB replay of :func:`k_anonymity_audit`; ``configs`` is a
    list of (label, table, [qi_cols], sensitive_col)."""
    parts = []
    for label, table, qi_cols, sensitive in configs:
        qis = ", ".join(qi_cols)
        parts.append(f"""
SELECT '{label}' AS qi,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN sz < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_lt_k,
       CAST(sum(CASE WHEN sz < {k} THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       CAST(min(ldiv) AS BIGINT) AS min_l_diversity
FROM (SELECT count(*) AS sz, count(DISTINCT {sensitive}) AS ldiv
      FROM {table} GROUP BY {qis})
""")
    return " UNION ALL ".join(parts) + " ORDER BY qi"


# Benford's-law expected first-digit shares, log10(1 + 1/d) in exact
# micro-units — ONE Python-generated integer table embedded verbatim in
# both engines (the linear-counting-table pattern), so no float log ever
# runs in either plan.
BENFORD_MICRO = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-digit (Benford's-law) audit of a monetary column — the
    classic fraud/synthetic-data screen: compare the observed leading-
    digit distribution of positive amounts against log10(1 + 1/d).

    Amounts clear to exact integer cents (round(x*100), the house money
    idiom); the leading digit is the first character of the cent
    integer's decimal string (identical in both engines — no float
    log10); shares and deviations are exact micro-units
    (dev = share - expected may be negative: plain BIGINT subtraction,
    no division). Returns (digit, n, share_micro, benford_micro,
    dev_micro) for digits 1-9, ordered.

    Scale: one map-combinable 9-group aggregate over the scan; the
    expected table is a 9-entry literal."""
    cents = F.expr(f"CAST(round({col} * 100) AS BIGINT)")
    digits = (
        df.select(cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        # ≤ 9 rows; checkpoint so the scalar action below and the main
        # plan share ONE source scan (round-9 ADVICE: the construction-
        # time collect must not cost a second pass over the column)
        .localCheckpoint()
    )
    total = digits.agg(F.sum("n")).collect()[0][0] or 1
    bm = " ".join(
        f"WHEN {d} THEN {v}" for d, v in sorted(BENFORD_MICRO.items())
    )
    return (
        digits.select(
            "digit",
            "n",
            F.expr(
                f"(n * CAST(1000000 AS BIGINT)) div CAST({int(total)} AS BIGINT)"
            ).alias("share_micro"),
            F.expr(f"CAST(CASE digit {bm} END AS BIGINT)").alias(
                "benford_micro"
            ),
        )
        .withColumn(
            "dev_micro", F.col("share_micro") - F.col("benford_micro")
        )
        .orderBy("digit")
    )


def benford_oracle_sql(table: str, col: str) -> str:
    """DuckDB replay of :func:`benford_profile`."""
    bm = " ".join(
        f"WHEN {d} THEN {v}" for d, v in sorted(BENFORD_MICRO.items())
    )
    return f"""
WITH cents AS MATERIALIZED (
  SELECT CAST(round({col} * 100) AS BIGINT) AS c FROM {table}
  WHERE CAST(round({col} * 100) AS BIGINT) > 0
), digits AS MATERIALIZED (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n
  FROM cents GROUP BY 1
)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // (SELECT sum(n) FROM digits) AS BIGINT)
         AS share_micro,
       CAST(CASE digit {bm} END AS BIGINT) AS benford_micro,
       CAST((n * 1000000) // (SELECT sum(n) FROM digits)
            - CASE digit {bm} END AS BIGINT) AS dev_micro
FROM digits ORDER BY digit
"""


def dup_order_audit(orders: DataFrame, top_n: int = 20) -> DataFrame:
    """Possible duplicate-transaction detection: orders by the same
    customer with the identical amount on the same day — the standard
    finance/ops double-charge screen. Amounts in exact integer cents,
    the day as exact epoch days; only groups with more than one order
    survive. Returns the top ``top_n`` groups by (n_orders DESC,
    o_custkey, total_cents, order_day) — totally ordered — as
    (o_custkey, total_cents, order_day, n_orders).

    Scale: one map-combinable groupBy over the scan + TakeOrdered."""
    return (
        orders.select(
            "o_custkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "total_cents"
            ),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
            )
            .cast("long")
            .alias("order_day"),
        )
        .groupBy("o_custkey", "total_cents", "order_day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 1)
        .orderBy(
            F.desc("n_orders"), "o_custkey", "total_cents", "order_day"
        )
        .limit(top_n)
    )


def dup_order_oracle_sql(top_n: int = 20) -> str:
    """DuckDB replay of :func:`dup_order_audit`."""
    return f"""
SELECT o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS order_day,
       count(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3
HAVING count(*) > 1
ORDER BY n_orders DESC, o_custkey, total_cents, order_day
LIMIT {top_n}
"""
