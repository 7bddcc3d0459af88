"""Lake compaction (sources/lake.py)."""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.sources.lake import compact_table  # noqa: E402


def test_compact_reduces_file_count(spark):
    d = tempfile.mkdtemp()
    path = f"{d}/t"
    # 20 tiny files
    spark.range(2000).repartition(20).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before == 20
    n = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == 2000


def test_compact_recovers_from_crash_mid_swap(spark):
    import shutil

    d = tempfile.mkdtemp()
    path = f"{d}/t"
    spark.range(500).repartition(4).write.parquet(path)
    # simulate a crash between the two moves: table stranded at __old,
    # plus a half-written __compacting directory left behind
    shutil.move(path, f"{path}__old")
    os.makedirs(f"{path}__compacting")
    compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert spark.read.parquet(path).count() == 500
    assert not os.path.exists(f"{path}__old")
    assert not os.path.exists(f"{path}__compacting")


def test_compact_clears_stale_old_after_completed_swap(spark):
    import shutil

    d = tempfile.mkdtemp()
    path = f"{d}/t"
    spark.range(500).repartition(4).write.parquet(path)
    # crash AFTER the swap completed: table is live, __old is stale
    spark.range(10).write.parquet(f"{path}__old")
    compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert spark.read.parquet(path).count() == 500
    assert not os.path.exists(f"{path}__old")
    shutil.rmtree(d)


def test_compact_partitioned_table_one_file_per_partition(spark):
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp()
    path = f"{d}/t"
    df = spark.range(3000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("batch_date")
    )
    # 5 small files per partition value
    df.repartition(5).write.partitionBy("batch_date").parquet(path)
    for v in range(3):
        assert len(glob.glob(f"{path}/batch_date={v}/*.parquet")) == 5
    compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    for v in range(3):
        assert len(glob.glob(f"{path}/batch_date={v}/*.parquet")) == 1
    assert spark.read.parquet(path).count() == 3000


def test_orc_lake_round_trip(spark, tmp_path):
    """ORC is a first-class lake container: partitioned write, pruned
    read, identical rows."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.sources.lake import read_table, write_table

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 2.0).alias("v"),
        F.when(F.col("id") < 50, "20250101").otherwise("20250102").alias(
            "batch_date"
        ),
    )
    path = str(tmp_path / "orc_lake")
    write_table(df, path, mode="overwrite", fmt="orc")
    back = read_table(spark, path, fmt="orc")
    assert back.count() == 100
    one_day = read_table(spark, path, batch_date="20250101", fmt="orc")
    assert one_day.count() == 50
    assert one_day.agg(F.sum("id")).first()[0] == sum(range(50))


def test_write_with_blooms_emits_bloom_filters(spark, tmp_path):
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.sources.lake import write_with_blooms

    df = spark.range(10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("grp")
    )
    path = str(tmp_path / "bloomed")
    plain = str(tmp_path / "plain")
    write_with_blooms(df.coalesce(1), path, ["user_id"], expected_ndv=10_000)
    df.coalesce(1).write.mode("overwrite").parquet(plain)
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in _glob.glob(f"{d}/*.parquet")
    )
    # the bloom filter physically lands in the file (this pyarrow build
    # doesn't expose bloom offsets in metadata, so assert via the size
    # delta: ~10k-NDV bloom is >= a few KB) and reads stay correct
    assert size(path) > size(plain) + 2048, (size(path), size(plain))
    back = spark.read.parquet(path).filter(F.col("user_id") == 1234)
    assert [r.user_id for r in back.collect()] == [1234]


def test_vacuum_drops_only_expired_partitions(spark, tmp_path):
    """Retention: partitions strictly older than keep_days before as_of go;
    the table stays readable with the surviving days intact."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.sources.lake import vacuum_table, write_table

    path = str(tmp_path / "posts")
    for day in ["20250310", "20250318", "20250320", "20250324"]:
        df = spark.createDataFrame(
            [(f"id_{day}", 1)], "id string, score int"
        ).withColumn("batch_date", F.lit(day))
        write_table(df, path, partition_by=["batch_date"])

    dropped = vacuum_table(path, keep_days=7, as_of="20250324")
    assert dropped == ["20250310"]  # 20250318 is exactly 6 days old: kept
    left = spark.read.parquet(path)
    # partition values come back type-inferred (int) — compare as strings
    assert sorted(
        str(r["batch_date"])
        for r in left.select("batch_date").distinct().collect()
    ) == ["20250318", "20250320", "20250324"]
    # idempotent: nothing further to drop
    assert vacuum_table(path, keep_days=7, as_of="20250324") == []


def test_vacuum_refuses_non_partitioned_table(spark, tmp_path):
    import pytest

    from reddit_etl_pipeline_spark.sources.lake import vacuum_table

    path = str(tmp_path / "flat")
    spark.createDataFrame([(1,)], "id long").write.parquet(path)
    with pytest.raises(ValueError):
        vacuum_table(path, keep_days=7, as_of="20250324")
