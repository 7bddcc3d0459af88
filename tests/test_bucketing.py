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


def test_bucketed_upsert_no_exchange_on_main(spark):
    """VERDICT #8: with the warehouse bucketed on the key, the upsert
    anti-join must not shuffle the main side — the only Exchange in the
    merged plan belongs to the (small) batch."""
    from reddit_etl_pipeline_spark.operators.upsert import (
        bucketed_upsert_plan,
        upsert_bucketed,
    )

    rows = [(i, f"title {i}", "2025-03-18 09:00:00") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, title string, extraction_timestamp string")
    B.write_bucketed(df, "wh_upsert_bkt", "id", n_buckets=8)
    try:
        batch = spark.createDataFrame(
            [(5, "updated 5", "2025-03-20 09:00:00"),
             (201, "new 201", "2025-03-20 09:00:00"),
             (201, "new 201 dup", "2025-03-21 09:00:00")],
            "id long, title string, extraction_timestamp string",
        )
        plan = io.StringIO()
        with contextlib.redirect_stdout(plan):
            bucketed_upsert_plan(spark, "wh_upsert_bkt", batch).explain()
        p = plan.getvalue()
        # the main side is the SortMergeJoin's first child: its bucketed
        # FileScan must sit directly under the join (Sort allowed,
        # Exchange not) — the batch side may shuffle all it likes
        assert "Bucketed: true" in p, p
        between = p.split("SortMergeJoin")[1].split("Bucketed: true")[0]
        assert "Exchange" not in between, p

        # end-to-end: swap preserves count semantics AND the bucket spec
        n = upsert_bucketed(spark, "wh_upsert_bkt", batch, n_buckets=8)
        assert n == 201
        got = {r.id: r.title for r in spark.table("wh_upsert_bkt").filter("id in (5, 201)").collect()}
        assert got == {5: "updated 5", 201: "new 201 dup"}
        desc = spark.sql("DESCRIBE TABLE EXTENDED wh_upsert_bkt").collect()
        info = {r.col_name: r.data_type for r in desc}
        assert info.get("Num Buckets") == "8", info
        assert "id" in info.get("Bucket Columns", ""), info
        # day 2: the swapped-in table still upserts with the same plan
        batch2 = spark.createDataFrame(
            [(201, "day2", "2025-03-22 09:00:00")],
            "id long, title string, extraction_timestamp string",
        )
        assert upsert_bucketed(spark, "wh_upsert_bkt", batch2, n_buckets=8) == 201
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_upsert_bkt")
        spark.sql("DROP TABLE IF EXISTS wh_upsert_bkt__upsert_staging")
