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
