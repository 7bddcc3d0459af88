"""Canonical query surface (BASELINE.md's five live queries) validated
against DuckDB running the reference's actual SQL on the same rows."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.plans import (
    hourly_avg_score,
    reddit_summary,
    run_models,
    stg_reddit,
    subreddit_stats,
    top_posts,
)
from reddit_etl_pipeline_spark.sources.csv_tolerant import read_posts_csv

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/20250320.csv"), reason="reference fixtures absent"
)


@pytest.fixture(scope="module")
def posts(spark):
    df = read_posts_csv(spark, f"{REF}/tmp/20250324.csv").cache()
    df.createOrReplaceTempView("reddit")
    return df


@pytest.fixture(scope="module")
def pdf(posts):
    return posts.toPandas()


def test_reddit_summary_vs_duckdb(posts, pdf):
    # models/marts/reddit_summary.sql:3-10
    got = {
        r.subreddit: (r.post_count, round(r.avg_score, 6), round(r.avg_comments, 6), r.max_score)
        for r in reddit_summary(posts).collect()
    }
    want = {
        row[0]: (row[1], round(row[2], 6), round(row[3], 6), row[4])
        for row in duckdb.sql(
            """SELECT subreddit, COUNT(*), AVG(score), AVG(num_comments), MAX(score)
               FROM pdf GROUP BY subreddit"""
        ).fetchall()
    }
    assert got == want


def test_stg_projection(posts):
    # models/staging/stg_reddit.sql:3-13
    assert stg_reddit(posts).columns == [
        "id", "title", "score", "num_comments", "author",
        "created_utc", "subreddit", "selftext", "selftext_length",
    ]


def test_top_posts_vs_duckdb(posts, pdf):
    # query-test.py:32-37 — ORDER BY score DESC LIMIT 2
    got = [(r.id, r.score) for r in top_posts(posts, 2).select("id", "score").collect()]
    want = duckdb.sql("SELECT id, score FROM pdf ORDER BY score DESC LIMIT 2").fetchall()
    assert [s for _, s in got] == [s for _, s in want]


def test_subreddit_stats_vs_duckdb(posts, pdf):
    # query-test.py:44-53
    got = {
        r.subreddit: (r.post_count, round(r.avg_score, 6))
        for r in subreddit_stats(posts, min_posts=5).collect()
    }
    want = {
        row[0]: (row[1], round(row[2], 6))
        for row in duckdb.sql(
            """SELECT subreddit, COUNT(*) AS pc, AVG(score) FROM pdf
               GROUP BY subreddit HAVING COUNT(*) > 5"""
        ).fetchall()
    }
    assert got == want


def test_hourly_avg_vs_duckdb(posts, pdf):
    # query-test.py:60-67
    got = {
        r.hour_of_day: round(r.avg_score, 6) for r in hourly_avg_score(posts).collect()
    }
    want = {
        int(row[0]): round(row[1], 6)
        for row in duckdb.sql(
            """SELECT EXTRACT(HOUR FROM created_utc) AS h, AVG(score)
               FROM pdf GROUP BY h"""
        ).fetchall()
    }
    assert got == want


def test_model_runner(spark, posts):
    out = run_models(spark)
    assert set(out) == {"stg_reddit", "reddit_summary"}
    # downstream model sees upstream view through the catalog
    assert spark.table("reddit_summary").count() == out["reddit_summary"].count()
    assert out["reddit_summary"].columns == [
        "subreddit", "post_count", "avg_score", "avg_comments", "max_score",
    ]


def test_topk_plans_as_take_ordered(posts):
    plan = top_posts(posts, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_union_all_literals(spark):
    # dbt example model (my_first_dbt_model.sql:10-19): literal 1 UNION ALL null
    df1 = spark.sql("SELECT 1 AS id")
    df2 = spark.sql("SELECT NULL AS id")
    u = df1.union(df2)
    assert u.count() == 2
    filtered = u.filter(F.col("id").isNotNull())  # the commented-out filter
    assert filtered.count() == 1
    # my_second_dbt_model.sql: SELECT * ... WHERE id = 1
    assert u.filter(F.col("id") == 1).count() == 1


def test_session_attribution_conserves_value(spark, sf_dir):
    """Both attribution models must credit the SAME total (every session
    credited exactly once per model), equal to the corpus value total in
    integer micros; single-event sessions credit first == last."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.plans import star as Q

    rows = Q.session_attribution(spark, sf_dir).collect()
    total_first = sum(r.first_value_micro for r in rows)
    total_last = sum(r.last_value_micro for r in rows)
    n_first = sum(r.first_sessions for r in rows)
    n_last = sum(r.last_sessions for r in rows)
    assert total_first == total_last
    assert n_first == n_last
    ev = Q.load(spark, sf_dir, "events")
    corpus_micro = ev.agg(
        F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
    ).first()[0]
    assert total_first == corpus_micro
    n_sessions = Q.sessionize(spark, sf_dir).count()
    assert n_first == n_sessions


def test_curation_funnel_monotone(spark, sf_dir):
    """Funnel counts never increase stage over stage; stage 1 equals the
    raw document count; shares are exact floors of n/input."""
    import __spark_entry__ as E

    rows = E.queries()["curation_funnel"](spark, sf_dir).collect()
    assert [r.stage for r in rows] == [
        "1_input", "2_exact_dedup", "3_neardup", "4_quality_gate",
    ]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    n0 = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert counts[0] == n0
    for r in rows:
        assert r.retained_micro == r.n_docs * 1_000_000 // n0
