"""Unit tests for the transform stage (SURVEY.md §2.3) against the
reference's semantics (extract-from-reddit.py:128-179)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.functions import transforms as X
from reddit_etl_pipeline_spark.schema import RAW_POSTS_SCHEMA, REDDIT_POSTS_SCHEMA


def raw_rows():
    return [
        {
            "id": "aaa0001",
            "title": "hello",
            "score": 10,
            "num_comments": 4,
            "author": "alice",
            "created_utc": 1742460000.0,  # 2025-03-20 09:20:00 UTC
            "url": "https://x",
            "upvote_ratio": 0.97,
            "over_18": "False",
            "spoiler": "False",
            "stickied": "False",
            "selftext": "body\nsecond line",
            "subreddit": "stocks",
        },
        {
            "id": "aaa0002",
            "title": "nulls",
            "score": None,
            "num_comments": None,
            "author": None,
            "created_utc": 1742463600.0,
            "url": None,
            "upvote_ratio": None,
            "over_18": "True",
            "spoiler": "False",
            "stickied": "False",
            "selftext": None,
            "subreddit": "stocks",
        },
    ]


@pytest.fixture(scope="module")
def staged(spark):
    raw = spark.createDataFrame(raw_rows(), RAW_POSTS_SCHEMA)
    return X.transform_posts(raw, extraction_at="2025-03-20 10:00:00").cache()


def test_schema_matches_warehouse(staged):
    assert [f.name for f in staged.schema.fields] == [
        f.name for f in REDDIT_POSTS_SCHEMA.fields
    ]


def test_epoch_to_utc_timestamp(staged):
    row = staged.filter(F.col("id") == "aaa0001").first()
    assert row.created_utc == dt.datetime(2025, 3, 20, 8, 40, 0)


def test_author_stringified(staged):
    # deleted account (None) -> literal 'None' (extract-from-reddit.py:97-99)
    assert staged.filter(F.col("id") == "aaa0002").first().author == "None"


def test_selftext_fill_and_length(staged):
    r1 = staged.filter(F.col("id") == "aaa0001").first()
    r2 = staged.filter(F.col("id") == "aaa0002").first()
    assert r1.selftext_length == len("body\nsecond line")
    assert r2.selftext == "" and r2.selftext_length == 0


def test_numeric_null_fill(staged):
    r2 = staged.filter(F.col("id") == "aaa0002").first()
    assert r2.score == 0 and r2.num_comments == 0 and r2.upvote_ratio == 0.0


def test_is_nsfw_copies_over_18(staged):
    rows = {r.id: r for r in staged.collect()}
    assert rows["aaa0001"].is_nsfw == "False"
    assert rows["aaa0002"].is_nsfw == "True"


def test_date_parts_pandas_convention(spark):
    raw = spark.createDataFrame(raw_rows(), RAW_POSTS_SCHEMA)
    df = X.add_date_parts(X.epoch_to_timestamp(raw))
    row = df.filter(F.col("id") == "aaa0001").first()
    # 2025-03-20 is a Thursday -> pandas dayofweek 3
    assert (row.created_year, row.created_month, row.created_day) == (2025, 3, 20)
    assert row.created_dayofweek == 3
    assert row.created_hour == 8


@pytest.mark.parametrize(
    "score,comments,bucket",
    [
        (0, 0, None),  # engagement 0 falls outside (0,10] — pandas cut -> NaN
        (1, 2, "Low"),  # 5
        (10, 0, "Low"),  # right-closed: 10 -> Low
        (11, 0, "Medium"),
        (50, 25, "High"),  # 100 -> High (right-closed)
        (99, 1, "Viral"),  # 101
    ],
)
def test_engagement_buckets_match_pd_cut(spark, score, comments, bucket):
    df = spark.createDataFrame(
        [("x", score, comments)], "id string, score long, num_comments long"
    )
    row = X.add_engagement(df).first()
    assert row.engagement_score == score + 2 * comments
    assert row.engagement_bucket == bucket


def test_truncate_varchar(spark):
    df = spark.createDataFrame([("i" * 300,)], "author string")
    assert len(X.truncate_varchar(df).first().author) == 100


def test_empty_input_guard(spark):
    from reddit_etl_pipeline_spark.schema import empty_posts

    assert empty_posts(spark).count() == 0
    assert X.transform_posts(
        spark.createDataFrame([], RAW_POSTS_SCHEMA)
    ).count() == 0


def test_engagement_bucket_null_inputs(spark):
    """NULL score/num_comments -> NULL bucket (pd.cut(NaN) parity), not
    a fall-through to the top label."""
    from reddit_etl_pipeline_spark.functions.transforms import add_engagement

    df = spark.createDataFrame(
        [(None, 5), (3, None), (None, None), (200, 10)],
        "score int, num_comments int",
    )
    rows = add_engagement(df).collect()
    buckets = [r.engagement_bucket for r in rows]
    assert buckets[:3] == [None, None, None]
    assert buckets[3] == "Viral"
