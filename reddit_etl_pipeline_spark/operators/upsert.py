"""Id-keyed last-write-wins upsert — the reference's warehouse MERGE.

The reference loads each daily batch into a temp staging table, then

    DELETE FROM reddit USING our_staging_table WHERE reddit.id = our_staging_table.id;
    INSERT INTO reddit SELECT * FROM our_staging_table;

(reference ``airflow/extraction/s3_to_redshift.py:226-232``, executed
``:357-363``; intent documented ``:9-15`` — re-extracted posts update
score/num_comments in place). Note the shipped code also drops the main
table every run (``:342``), degenerating upsert to replace; we implement
the *intended* accumulate-and-upsert semantics (SURVEY.md §3.2).

Two equivalent Spark formulations:

- ``upsert_anti_join`` — DELETE USING ≡ left-anti join, INSERT ≡ unionByName.
  One shuffle on ``id`` for the join. When the daily batch is small relative
  to the lake (the reference's regime: ~200 rows/day), the batch side is
  broadcast and the anti-join is shuffle-free on the big side.
- ``upsert_latest_wins`` — union all batches then keep the newest row per
  id via max_by aggregation. Best for replaying many batches at once:
  one aggregation instead of N sequential joins; partial (map-side)
  aggregation cuts the shuffle.

At 100 TB the anti-join variant should be bounded to affected
``batch_date`` partitions before writing (dynamic partition overwrite) —
see ``plans.pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_anti_join(
    main: DataFrame,
    batch: DataFrame,
    key: str = "id",
    broadcast_batch: bool = True,
    order_col: str = "extraction_timestamp",
) -> DataFrame:
    """DELETE USING + INSERT as anti-join ∪ batch.

    The batch itself is first deduped on ``key`` (newest by ``order_col``
    when present, else an arbitrary-but-single row) — a batch can carry
    the same id twice (API pagination overlap, duplicated CSV row) and
    blindly inserting both would break the key contract the warehouse
    asserts AFTER the swap, leaving duplicates durable.

    ``broadcast_batch=True`` (default) hints the daily batch as the
    broadcast side — correct whenever the incoming batch fits in executor
    memory, which is the reference's daily-load shape.
    """
    if order_col in batch.columns:
        batch = upsert_latest_wins(batch, key=key, order_col=order_col)
    else:
        batch = batch.dropDuplicates([key])
    probe = F.broadcast(batch.select(key)) if broadcast_batch else batch.select(key)
    survivors = main.join(probe, key, "left_anti")
    return survivors.unionByName(batch.select(*main.columns))


def upsert_latest_wins(
    df: DataFrame,
    key: str = "id",
    order_col: str = "extraction_timestamp",
) -> DataFrame:
    """Keep the newest row per key from a union of batches.

    Implemented as a single hash aggregate ``max_by(struct(*), order_col)``
    rather than a row_number window: the aggregate gets map-side partial
    combine (each input partition reduces to ≤ distinct-keys rows before
    the shuffle), while a window must shuffle every row. Ties on
    ``order_col`` break deterministically toward the later batch by
    comparing (order_col, __seq) pairs, where __seq is monotonic input
    order — callers replaying batches should union them oldest-first.
    """
    seq = F.monotonically_increasing_id()
    value_cols = list(df.columns)
    packed = df.select(
        F.col(key),
        F.struct(F.col(order_col).alias("__ord"), seq.alias("__seq")).alias("__rank"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__row"),
    )
    latest = packed.groupBy(key).agg(F.max_by("__row", "__rank").alias("__row"))
    return latest.select(*[F.col(f"__row.{c}").alias(c) for c in value_cols])


def upsert_bucketed(
    spark: SparkSession,
    main_table: str,
    batch: DataFrame,
    key: str = "id",
    order_col: str = "extraction_timestamp",
    n_buckets: int = 16,
) -> int:
    """Upsert into a ``key``-bucketed warehouse table, preserving the
    bucketed layout across runs.

    The 100 TB note on this module made real: with the warehouse stored
    ``bucketBy(n_buckets, key)``, the DELETE-USING anti-join reads the
    main side bucket-local — its scan already satisfies
    ``HashPartitioning(key)``, so the plan has NO Exchange on the big
    side; only the (much smaller) daily batch shuffles to align
    (pinned by tests/test_bucketing.py). The shuffle of the full
    warehouse is paid exactly once, at table creation, never per-day.

    The merged result is written back ``bucketBy`` the same spec via a
    staging table + atomic catalog rename (Spark refuses to overwrite a
    table it is reading), so tomorrow's upsert gets the same plan.
    Returns the post-upsert row count (read from the swapped-in table —
    also forces materialization before the swap is declared done).
    """
    merged = bucketed_upsert_plan(spark, main_table, batch, key, order_col)

    staging = f"{main_table}__upsert_staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    (
        merged.write.mode("errorifexists")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(staging)
    )
    spark.sql(f"DROP TABLE {main_table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {main_table}")
    return spark.table(main_table).count()


def bucketed_upsert_plan(
    spark: SparkSession,
    main_table: str,
    batch: DataFrame,
    key: str = "id",
    order_col: str = "extraction_timestamp",
) -> DataFrame:
    """The lazy merged relation of :func:`upsert_bucketed` (no write/swap)
    — exposed so plan tests can assert the no-Exchange property."""
    main = spark.table(main_table)
    if order_col in batch.columns:
        batch = upsert_latest_wins(batch, key=key, order_col=order_col)
    else:
        batch = batch.dropDuplicates([key])
    # merge hint: at warehouse scale neither the anti-join probe nor the
    # union write wants a broadcast; SMJ lets the bucketed scan's output
    # partitioning absorb the main-side Exchange entirely
    survivors = main.join(batch.select(key).hint("merge"), key, "left_anti")
    return survivors.unionByName(batch.select(*main.columns))


def upsert_window_dedup(
    df: DataFrame,
    key: str = "id",
    order_col: str = "extraction_timestamp",
) -> DataFrame:
    """Windowed formulation (SURVEY.md §2.8): row_number over
    (partition by key order by order_col desc) = 1. Kept for parity /
    cross-checking the aggregate formulation; prefer ``upsert_latest_wins``
    in the hot path (map-side combine beats full-shuffle window)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
