"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the lineitem⋈orders style fact-fact join shuffles both sides on
the key every time it runs. Bucketing pays that shuffle ONCE at write
time: both tables hash-partitioned into the same number of buckets on the
join key, so every subsequent equi-join (and groupBy on the key) reads
bucket i against bucket i with no Exchange in the plan. The classic
warehouse layout for repeatedly-joined facts.

Spark specifics: bucketing requires ``saveAsTable`` (metastore-tracked),
``spark.sql.sources.bucketing.enabled`` (default true), and equal bucket
counts on both sides. Sort within buckets (``sortBy``) additionally
enables merge-join without a sort step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize a relation as a bucketed (and bucket-sorted) table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_revenue(
    spark: SparkSession,
    lineitem_table: str = "lineitem_bkt",
    orders_table: str = "orders_bkt",
) -> DataFrame:
    """The revenue-per-orderpriority rollup over pre-bucketed fact tables.
    With both sides bucketed on the key, the join plan has NO shuffle
    Exchange (verified in tests/test_bucketing.py)."""
    li = spark.table(lineitem_table)
    # merge hint: bucketing exists for the sort-merge path (at real scale
    # neither fact side broadcasts; without the hint a small test-scale
    # orders table would broadcast and mask the co-location property)
    orders = spark.table(orders_table).hint("merge")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
