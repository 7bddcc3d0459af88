"""dbt-equivalent model runner.

The reference's dbt project is a 2-model DAG — view ``stg_reddit`` ->
table ``reddit_summary`` (reference ``models/staging/stg_reddit.sql``,
``models/marts/reddit_summary.sql``; project config
``dbt/reddit_dbt/dbt_project.yml``) — compiled by Jinja and executed as
``CREATE VIEW/TABLE AS`` on Redshift.

Here a *model* is (name, DataFrame expression over upstream models,
materialization). ``run_models`` topologically orders by declaration,
registers views via ``createOrReplaceTempView`` (zero-cost — a named
Catalyst subplan) and writes tables via parquet. dbt's DAG ordering is
subsumed by Catalyst's own plan DAG: a downstream table's plan inlines its
upstream views, so the whole model chain is one optimized job per table
materialization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from . import queries as Q


@dataclass
class Model:
    name: str
    build: Callable[[SparkSession], DataFrame]  # reads upstream via spark.table
    materialized: str = "view"  # 'view' | 'table'


def _stg(spark: SparkSession) -> DataFrame:
    return Q.stg_reddit(spark.table("reddit"))


def _summary(spark: SparkSession) -> DataFrame:
    return Q.reddit_summary(spark.table("stg_reddit"))


#: The reference's model DAG in declaration (= topological) order.
MODELS: list[Model] = [
    Model("stg_reddit", _stg, materialized="view"),
    Model("reddit_summary", _summary, materialized="table"),
]


def run_models(
    spark: SparkSession,
    models: list[Model] | None = None,
    table_base_path: str | None = None,
) -> dict[str, DataFrame]:
    """Execute the model DAG against the registered ``reddit`` view.

    Views cost nothing at run time; tables are materialized to parquet
    under ``table_base_path`` (or kept as eager temp views when no path is
    given — test mode). Returns name -> DataFrame.
    """
    out: dict[str, DataFrame] = {}
    for m in models or MODELS:
        df = m.build(spark)
        if m.materialized == "table" and table_base_path:
            path = f"{table_base_path}/{m.name}"
            df.write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(m.name)
        out[m.name] = df
    return out
