"""Canonical analytics queries — the reference's live query surface.

The five live queries (BASELINE.md): the two dbt models
(reference ``models/staging/stg_reddit.sql``, ``models/marts/reddit_summary.sql``)
and the three ``query-test.py`` analytics (top-K, HAVING stats, hourly
curve). All are single-stage Catalyst plans: scan -> partial agg ->
shuffle on the grouping key -> final agg (HashAggregateExec both sides),
or TakeOrderedAndProject for top-K. Column pruning reaches the parquet
scan, so e.g. ``reddit_summary`` reads only (subreddit, score,
num_comments) no matter how wide the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STG_COLUMNS = [
    # staging projection, 9 of 16 cols (models/staging/stg_reddit.sql:3-13)
    "id",
    "title",
    "score",
    "num_comments",
    "author",
    "created_utc",
    "subreddit",
    "selftext",
    "selftext_length",
]


def stg_reddit(posts: DataFrame) -> DataFrame:
    """dbt staging view: 9-column projection (stg_reddit.sql:3-13)."""
    return posts.select(*STG_COLUMNS)


def reddit_summary(posts: DataFrame) -> DataFrame:
    """dbt mart: per-subreddit aggregate (reddit_summary.sql:3-10)."""
    return posts.groupBy("subreddit").agg(
        F.count(F.lit(1)).alias("post_count"),
        F.avg("score").alias("avg_score"),
        F.avg("num_comments").alias("avg_comments"),
        F.max("score").alias("max_score"),
    )


def top_posts(posts: DataFrame, k: int = 2) -> DataFrame:
    """Top-K by score (query-test.py:32-37). orderBy+limit plans as
    TakeOrderedAndProject: per-partition heap of K, no full sort."""
    return posts.orderBy(F.desc("score")).limit(k)


def subreddit_stats(posts: DataFrame, min_posts: int = 5) -> DataFrame:
    """Subreddit stats with HAVING (query-test.py:44-53): groups by
    subreddit, filters post_count > min_posts, orders by avg_score desc.
    (The reference selects the aggregates without the group key; we keep
    the key — strictly more informative, same aggregates.)"""
    return (
        posts.groupBy("subreddit")
        .agg(
            F.count(F.lit(1)).alias("post_count"),
            F.avg("score").alias("avg_score"),
            F.avg("num_comments").alias("avg_comments"),
        )
        .filter(F.col("post_count") > min_posts)
        .orderBy(F.desc("avg_score"))
    )


def hourly_avg_score(posts: DataFrame) -> DataFrame:
    """Hourly score curve (query-test.py:60-67): GROUP BY
    EXTRACT(HOUR FROM created_utc), AVG(score), ORDER BY hour."""
    return (
        posts.groupBy(F.hour("created_utc").alias("hour_of_day"))
        .agg(F.avg("score").alias("avg_score"))
        .orderBy("hour_of_day")
    )
