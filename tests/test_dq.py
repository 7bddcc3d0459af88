"""dq_report: rule-based data-quality report (operators/quality.py)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators.quality import dq_report  # noqa: E402


def test_dq_report_counts_violations_in_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (-3, "c"), (4, "d")], ["x", "s"]
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["violation_rate"])
        for r in dq_report(
            df,
            {
                "x_positive": F.col("x") > 0,
                "s_not_null": F.col("s").isNotNull(),
            },
        ).collect()
    }
    assert out["x_positive"] == (4, 1, 0.25)
    assert out["s_not_null"] == (4, 1, 0.25)


def test_dq_report_rejects_non_identifier_rule_names(spark):
    """Rule names are interpolated into the stack() SQL string — a quote
    or space would break or inject into the expression, so they must be
    validated as identifiers."""
    df = spark.range(3)
    for bad in ("has space", "quo'te", "semi;colon", "hy-phen", ""):
        with pytest.raises(ValueError, match="rule names"):
            dq_report(df, {bad: F.col("id") >= 0})
