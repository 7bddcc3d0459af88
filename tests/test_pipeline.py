"""End-to-end daily-batch pipeline (SURVEY.md §3): fetch -> transform ->
lake -> upsert -> models, replayed over three synthetic days."""

import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.plans.pipeline import run_daily_batch
from reddit_etl_pipeline_spark.sources.reddit_api import FakeRedditSource


@pytest.mark.slow
def test_three_day_replay(spark, tmp_path):
    lake = str(tmp_path / "lake")
    wh = str(tmp_path / "warehouse")

    audits = []
    for day, date in enumerate(["20250318", "20250320", "20250324"]):
        audits.append(
            run_daily_batch(
                spark,
                FakeRedditSource(n=100 + day * 10, day=day),
                lake_path=lake,
                warehouse_path=wh,
                batch_date=date,
                extraction_at=f"2025-03-{18 + day * 2:02d} 09:00:00",
            )
        )

    # fake source reuses ids across days -> upsert keeps one row per id
    wh_df = spark.read.parquet(wh)
    assert wh_df.count() == wh_df.select("id").distinct().count()
    # the largest day defines the id universe (ids are sequential from 0)
    assert wh_df.count() == 120
    # last-write-wins: surviving values come from the *latest* batch
    assert (
        wh_df.agg(F.max("extraction_timestamp")).first()[0].strftime("%Y%m%d")
        == "20250322"
    )
    # lake keeps full history partitioned by batch_date
    lake_df = spark.read.parquet(lake)
    assert lake_df.select("batch_date").distinct().count() == 3
    assert lake_df.count() == 100 + 110 + 120

    # models materialized
    assert spark.table("reddit_summary").first().post_count == 120
    # audits captured the reference's observability surface
    assert audits[-1]["warehouse_rows"] == 120
    assert audits[-1]["batch_rows"] == 120
    assert "avg_score" in audits[-1]


def test_rerun_same_day_is_idempotent(spark, tmp_path):
    lake = str(tmp_path / "lake")
    wh = str(tmp_path / "warehouse")
    for _ in range(2):  # same day twice
        run_daily_batch(
            spark,
            FakeRedditSource(n=50, day=0),
            lake_path=lake,
            warehouse_path=wh,
            batch_date="20250318",
            extraction_at="2025-03-18 09:00:00",
            run_dbt_models=False,
        )
    assert spark.read.parquet(wh).count() == 50
    assert spark.read.parquet(lake).count() == 50  # partition overwritten, not doubled


def test_partition_pruning_on_batch_date(spark, tmp_path):
    from reddit_etl_pipeline_spark.sources.lake import read_table

    lake = str(tmp_path / "lake")
    for day, date in enumerate(["20250318", "20250320"]):
        run_daily_batch(
            spark, FakeRedditSource(n=20, day=day), lake_path=lake,
            warehouse_path=str(tmp_path / "wh"), batch_date=date,
            extraction_at="2025-03-18 09:00:00", run_dbt_models=False,
        )
    pruned = read_table(spark, lake, batch_date="20250320")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 20
    # the filter must reach the scan as a partition filter, not a row filter
    assert "PartitionFilters" in plan


def test_backfill_retries_flaky_day_then_succeeds(spark, tmp_path):
    """DAG-cadence parity: days run in order; a day whose fetch fails once
    is retried (retries=1, like the reference DAG) and the backfill
    completes with every day loaded."""
    from reddit_etl_pipeline_spark.plans.pipeline import run_backfill

    failures = {"20250320": 1}  # first attempt of day 2 blows up
    sleeps = []

    def fetcher_for_date(date):
        src = FakeRedditSource(n=50, day=int(date[-2:]) % 7)

        def fetch():
            if failures.get(date, 0) > 0:
                failures[date] -= 1
                raise ConnectionError("transient fetch failure")
            return src()

        return fetch

    results = run_backfill(
        spark,
        fetcher_for_date,
        lake_path=str(tmp_path / "lake"),
        warehouse_path=str(tmp_path / "wh"),
        batch_dates=["20250318", "20250320", "20250324"],
        sleep=sleeps.append,
    )
    assert sorted(results) == ["20250318", "20250320", "20250324"]
    assert sleeps == [15.0]  # one retry pause, reference delay
    assert spark.read.parquet(str(tmp_path / "wh")).count() > 0


def test_backfill_aborts_after_retry_budget_and_keeps_prior_days(spark, tmp_path):
    import pytest

    from reddit_etl_pipeline_spark.plans.pipeline import run_backfill

    def fetcher_for_date(date):
        if date == "20250320":
            def always_fail():
                raise ConnectionError("down hard")
            return always_fail
        return FakeRedditSource(n=40, day=0)

    with pytest.raises(ConnectionError):
        run_backfill(
            spark,
            fetcher_for_date,
            lake_path=str(tmp_path / "lake"),
            warehouse_path=str(tmp_path / "wh"),
            batch_dates=["20250318", "20250320", "20250324"],
            sleep=lambda s: None,
        )
    # day 1 committed durably; day 3 never ran (order dependence)
    wh = spark.read.parquet(str(tmp_path / "wh"))
    assert wh.count() == 40


@pytest.mark.slow
def test_daily_batch_maintains_sketch_store(spark, tmp_path):
    """run_daily_batch(sketch_store_path=...) appends each day's author
    HLL + score-grid partials at ingest; the merged store answers must
    equal direct full-lake computation, and a day's rerun must not
    change them (dynamic overwrite idempotency)."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators import sketches as SK
    from reddit_etl_pipeline_spark.plans.pipeline import (
        post_sketch_distinct_authors,
        post_sketch_score_quantiles,
        run_daily_batch,
    )
    from reddit_etl_pipeline_spark.sources import FakeRedditSource

    lake = str(tmp_path / "lake")
    wh = str(tmp_path / "wh")
    store = str(tmp_path / "sketches")
    for day, date in enumerate(["20250318", "20250319", "20250320"]):
        run_daily_batch(
            spark,
            FakeRedditSource(n=120 + day * 10, day=day),
            lake_path=lake,
            warehouse_path=wh,
            batch_date=date,
            extraction_at=f"2025-03-{18 + day} 09:00:00",
            sketch_store_path=store,
        )
    lake_df = spark.read.parquet(lake)
    direct_users = sorted(
        map(
            tuple,
            SK.hll_estimate(
                SK.hll_registers(lake_df, "subreddit", F.xxhash64("author")),
                "subreddit",
            ).collect(),
        )
    )
    got_users = sorted(
        map(tuple, post_sketch_distinct_authors(spark, store).collect())
    )
    assert got_users == direct_users
    direct_q = sorted(
        map(
            tuple,
            SK.grid_quantile_stats(
                SK.value_grid_bins(
                    lake_df.withColumn(
                        "score_d", F.col("score").cast("double")
                    ),
                    "subreddit",
                    "score_d",
                ),
                "subreddit",
            ).collect(),
        )
    )
    got_q = sorted(
        map(tuple, post_sketch_score_quantiles(spark, store).collect())
    )
    assert got_q == direct_q
    # rerun day 2: idempotent, answers unchanged
    run_daily_batch(
        spark,
        FakeRedditSource(n=130, day=1),
        lake_path=lake,
        warehouse_path=wh,
        batch_date="20250319",
        extraction_at="2025-03-19 09:00:00",
        sketch_store_path=store,
    )
    assert sorted(
        map(tuple, post_sketch_distinct_authors(spark, store).collect())
    ) == got_users


@pytest.mark.slow
def test_backfill_carries_sketch_store(spark, tmp_path):
    """A rebuilt lake must arrive WITH its store: run_backfill forwards
    sketch_store_path to every replayed day (retried days included), so
    each batch_date lands its partial partitions and the merged store
    answers equal direct full-lake computation."""
    import glob

    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators import sketches as SK
    from reddit_etl_pipeline_spark.plans.pipeline import (
        post_sketch_distinct_authors,
        run_backfill,
    )
    from reddit_etl_pipeline_spark.sources import FakeRedditSource

    dates = ["20250318", "20250319", "20250320"]
    failures = {"20250319": 1}  # the retried day must still write partials

    def fetcher_for_date(date):
        src = FakeRedditSource(n=100 + int(date[-2:]), day=int(date[-2:]) % 7)

        def fetch():
            if failures.get(date, 0) > 0:
                failures[date] -= 1
                raise ConnectionError("transient fetch failure")
            return src()

        return fetch

    lake = str(tmp_path / "lake")
    store = str(tmp_path / "sketches")
    run_backfill(
        spark,
        fetcher_for_date,
        lake_path=lake,
        warehouse_path=str(tmp_path / "wh"),
        batch_dates=dates,
        sleep=lambda s: None,
        sketch_store_path=store,
    )
    # one partial partition per replayed day, both store tables
    for table in ("author_hll", "score_grid"):
        parts = sorted(
            p.rsplit("batch_date=", 1)[-1]
            for p in glob.glob(f"{store}/{table}/batch_date=*")
        )
        assert parts == dates
    # merged store answers == direct full-lake scan
    lake_df = spark.read.parquet(lake)
    direct = sorted(
        map(
            tuple,
            SK.hll_estimate(
                SK.hll_registers(lake_df, "subreddit", F.xxhash64("author")),
                "subreddit",
            ).collect(),
        )
    )
    got = sorted(
        map(tuple, post_sketch_distinct_authors(spark, store).collect())
    )
    assert got == direct
