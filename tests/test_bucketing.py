"""Bucketed co-located join: correctness vs the unbucketed plan AND the
no-shuffle property that justifies it."""

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.plans import bucketing as B  # noqa: E402


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    B.write_bucketed(li, "lineitem_bkt", "l_orderkey", n_buckets=8)
    B.write_bucketed(orders, "orders_bkt", "o_orderkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    df = B.bucketed_join_revenue(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    # neither join side shuffles (bucket co-location); the only Exchange
    # is the final groupBy(o_orderpriority) aggregation shuffle
    assert plan.count("Exchange") == 1, plan


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    got = {
        r.o_orderpriority: (round(r.revenue, 2), r.n_items)
        for r in B.bucketed_join_revenue(spark).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    want = {
        r.o_orderpriority: (round(r.revenue, 2), r.n_items)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .collect()
    }
    assert got == want
