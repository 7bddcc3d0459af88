#!/usr/bin/env python
"""The reference's warehouse->pandas->chart edge, Spark-first.

Mirrors ``airflow/extraction/query-test.py:60-79``: hour-of-day average
score pulled from the warehouse into pandas and rendered as a bar chart
(``score_by_hour.png``). The engine's equivalent edge is
``DataFrame.toPandas()`` (Arrow-batched, see session.py) — the ONLY
driver-side collection in the repo, and it is post-aggregation: 24 rows
cross the boundary no matter how large the warehouse is.

matplotlib is optional (not in the engine's runtime deps); without it the
demo prints an ASCII bar chart so the edge is still exercised end-to-end.

Usage: python tools/chart_demo.py [warehouse_parquet_path]
With no argument, a FakeRedditSource batch stands in for the warehouse.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def hourly_avg_score(df):
    """EXTRACT(HOUR FROM created_utc), AVG(score) — query-test.py:61-67."""
    return (
        df.groupBy(F.hour("created_utc").alias("hour_of_day"))
        .agg(F.round(F.avg("score"), 6).alias("avg_score"))
        .orderBy("hour_of_day")
    )


def render(pdf, out_path: str = "score_by_hour.png") -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        width = 50
        top = max(pdf["avg_score"].max(), 1e-9)
        print("\nAverage Post Score by Hour of Day")
        for _, r in pdf.iterrows():
            bar = "#" * int(round(width * r["avg_score"] / top))
            print(f"{int(r['hour_of_day']):2d} | {bar} {r['avg_score']:.2f}")
        print("\n(matplotlib not installed — ASCII fallback)")
        return
    plt.figure(figsize=(10, 6))
    plt.bar(pdf["hour_of_day"], pdf["avg_score"])
    plt.title("Average Post Score by Hour of Day")
    plt.xlabel("Hour of Day")
    plt.ylabel("Average Score")
    plt.xticks(range(0, 24))
    plt.grid(axis="y", linestyle="--", alpha=0.7)
    plt.savefig(out_path)
    print(f"Analysis complete! Check '{out_path}' for visualization.")


def main() -> None:
    from reddit_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="chart_demo", shuffle_partitions=8)
    if len(sys.argv) > 1:
        df = spark.read.parquet(sys.argv[1])
    else:
        from reddit_etl_pipeline_spark.functions.transforms import (
            epoch_to_timestamp,
        )
        from reddit_etl_pipeline_spark.sources import (
            FakeRedditSource,
            fetch_posts_df,
        )

        df = epoch_to_timestamp(
            fetch_posts_df(spark, FakeRedditSource(n=500)), "created_utc"
        )
    render(hourly_avg_score(df).toPandas())


if __name__ == "__main__":
    main()
