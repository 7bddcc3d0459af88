"""Upsert semantics (SURVEY.md §2.5): DELETE USING + INSERT ≡ last-write-wins
on id. Replays multi-batch scenarios and cross-checks all three
formulations (anti-join, max_by aggregate, window dedup) against each other
and against DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators.upsert import (
    upsert_anti_join,
    upsert_latest_wins,
    upsert_window_dedup,
)

SCHEMA = "id string, score long, extraction_timestamp timestamp"


def batch(spark, rows):
    import datetime as dt

    rows = [
        (i, s, dt.datetime.fromisoformat(ts)) for (i, s, ts) in rows
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def batches(spark):
    b1 = batch(
        spark,
        [("a", 1, "2025-03-18 09:00:00"), ("b", 2, "2025-03-18 09:00:00")],
    )
    b2 = batch(
        spark,
        [("b", 20, "2025-03-20 09:00:00"), ("c", 3, "2025-03-20 09:00:00")],
    )
    b3 = batch(
        spark,
        [("c", 30, "2025-03-24 09:00:00"), ("d", 4, "2025-03-24 09:00:00")],
    )
    return b1, b2, b3


EXPECTED = {"a": 1, "b": 20, "c": 30, "d": 4}


def test_anti_join_replay(batches):
    b1, b2, b3 = batches
    main = b1
    for b in (b2, b3):
        main = upsert_anti_join(main, b)
    got = {r.id: r.score for r in main.collect()}
    assert got == EXPECTED


def test_latest_wins_aggregate(batches):
    b1, b2, b3 = batches
    allb = b1.unionByName(b2).unionByName(b3)
    got = {r.id: r.score for r in upsert_latest_wins(allb).collect()}
    assert got == EXPECTED


def test_window_dedup(batches):
    b1, b2, b3 = batches
    allb = b1.unionByName(b2).unionByName(b3)
    got = {r.id: r.score for r in upsert_window_dedup(allb).collect()}
    assert got == EXPECTED


def test_matches_duckdb_oracle(spark, batches):
    b1, b2, b3 = batches
    allb = b1.unionByName(b2).unionByName(b3)
    pdf = allb.toPandas()
    oracle = duckdb.sql(
        """
        SELECT id, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY id ORDER BY extraction_timestamp DESC) AS rn
          FROM pdf) WHERE rn = 1
        """
    ).fetchall()
    assert dict(oracle) == {
        r.id: r.score for r in upsert_latest_wins(allb).collect()
    }


def test_anti_join_preserves_column_order(batches):
    b1, b2, _ = batches
    assert upsert_anti_join(b1, b2).columns == b1.columns


def test_upsert_idempotent(batches):
    """Re-running the same batch must not change the result (the
    reference's documented rerun semantics, s3_to_redshift.py:9-15)."""
    b1, b2, _ = batches
    once = upsert_anti_join(b1, b2)
    twice = upsert_anti_join(once, b2)
    assert {(r.id, r.score) for r in twice.collect()} == {
        (r.id, r.score) for r in once.collect()
    }


def test_real_csv_replay(spark):
    """Replay the reference's shipped daily extracts in date order; ids
    overlapping across days take the later day's values."""
    import os

    if not os.path.exists("/root/reference/20250320.csv"):
        pytest.skip("reference fixtures absent")
    from reddit_etl_pipeline_spark.sources.csv_tolerant import read_posts_csv

    d18 = read_posts_csv(spark, "/root/reference/20250318.csv")
    d20 = read_posts_csv(spark, "/root/reference/20250320.csv")
    d24 = read_posts_csv(spark, "/root/reference/tmp/20250324.csv")

    main = d18
    for b in (d20, d24):
        main = upsert_anti_join(main, b)
    main = main.cache()

    n18, n20, n24 = d18.count(), d20.count(), d24.count()
    overlap_18_20 = d18.join(d20, "id", "left_semi").count()
    # later-loaded batches win: ids in both 18 & 20 carry 20's values
    total = main.count()
    distinct_ids = main.select("id").distinct().count()
    assert total == distinct_ids  # id is a primary key after upsert
    # cross-check the final row count against a union-distinct oracle
    expected_ids = (
        d18.select("id").union(d20.select("id")).union(d24.select("id")).distinct().count()
    )
    assert total == expected_ids
    # spot-check last-write-wins on an overlapping id, if any
    if overlap_18_20:
        some_id = d18.join(d20, "id", "left_semi").select("id").first().id
        got = main.filter(F.col("id") == some_id).first()
        want = d24.filter(F.col("id") == some_id).first() or d20.filter(
            F.col("id") == some_id
        ).first()
        assert got.score == want.score


def test_upsert_anti_join_dedupes_batch(spark):
    """A batch carrying the same id twice must land exactly one row
    (newest by extraction_timestamp)."""
    from reddit_etl_pipeline_spark.operators.upsert import upsert_anti_join

    import datetime as dt

    schema = "id string, score long, extraction_timestamp timestamp"
    t = lambda h: dt.datetime(2025, 3, 19, h, 0, 0)  # noqa: E731
    main = spark.createDataFrame([("a", 1, t(1))], schema)
    batch = spark.createDataFrame(
        [("a", 5, t(9)), ("a", 9, t(10)), ("b", 2, t(9))], schema
    )
    out = {r.id: r.score for r in upsert_anti_join(main, batch).collect()}
    assert out == {"a": 9, "b": 2}
