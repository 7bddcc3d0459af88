#!/usr/bin/env python
"""Bucketed-layout demonstration at synthetic 100x scale (verdict r3 #7).

Measures the lineitem⋈orders fact-fact revenue rollup three ways on a
make_scale_data.py 100x directory:

  1. plain parquet join (every run pays the co-partitioning shuffle)
  2. the one-time bucketed WRITE of both facts (the shuffle, paid once)
  3. the join over the bucketed tables (no Exchange on either fact side)

Prints one JSON line per step with wall seconds + stage-aggregated
shuffle read/write from the Spark UI REST API, asserts the bucketed plan
is Exchange-free above the scans, and asserts both joins return
identical results.

Usage: python tools/demo_bucketing_100x.py [SCALE_DIR] [N_BUCKETS]
       (default /tmp/scale100_core, 64 buckets)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100_core"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from reddit_etl_pipeline_spark.plans.bucketing import (
        bucketed_join_revenue,
        write_bucketed,
    )
    from reddit_etl_pipeline_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="bucket_demo_wh_")
    spark = get_spark(
        app_name="bucket_demo",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.warehouse.dir": wh,
            # neither fact side may broadcast: the demo measures the
            # co-location property, not a small-side shortcut
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def measured(label, fn):
        before = {
            s["stageId"]
            for s in _get(f"{ui}/api/v1/applications/{app_id}/stages")
        }
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 1)
        time.sleep(0.5)
        stages = [
            s
            for s in _get(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
            if s["stageId"] not in before
        ]
        print(
            json.dumps(
                {
                    "step": label,
                    "wall_s": wall,
                    "shuffle_read_mb": round(
                        sum(s["shuffleReadBytes"] for s in stages) / 2**20, 1
                    ),
                    "shuffle_write_mb": round(
                        sum(s["shuffleWriteBytes"] for s in stages) / 2**20, 1
                    ),
                    "spill_disk_mb": round(
                        sum(s["diskBytesSpilled"] for s in stages) / 2**20, 1
                    ),
                }
            )
        )
        return out

    li = spark.read.parquet(f"{scale_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{scale_dir}/orders.parquet")
    print(
        json.dumps(
            {"step": "inputs", "lineitem": li.count(), "orders": orders.count()}
        )
    )

    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )

    def plain():
        return sorted(
            li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum(rev).cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .collect()
        )

    plain_rows = measured("plain_join", plain)

    def bucket_write():
        write_bucketed(li, "lineitem_bkt100", "l_orderkey", n_buckets)
        write_bucketed(orders, "orders_bkt100", "o_orderkey", n_buckets)

    measured("bucketed_write_once", bucket_write)

    q = bucketed_join_revenue(spark, "lineitem_bkt100", "orders_bkt100")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # exactly ONE Exchange: the 6-group rollup on o_orderpriority (not a
    # join key). Below the SortMergeJoin — the fact-fact edge that
    # shuffled 977 MB unbucketed — there must be NO Exchange: bucket i
    # reads against bucket i.
    n_exchange = plan.count("Exchange")
    below_join = plan.split("SortMergeJoin", 1)[1]
    print(
        json.dumps(
            {
                "step": "bucketed_plan",
                "exchanges_total": n_exchange,
                "exchanges_below_join": below_join.count("Exchange"),
                "bucketed_scans": plan.count("Bucketed: true"),
            }
        )
    )
    assert n_exchange == 1 and "Exchange" not in below_join, plan[:2000]

    bkt_rows = measured("bucketed_join", lambda: sorted(q.collect()))
    assert bkt_rows == plain_rows, "bucketed result != plain result"
    print(json.dumps({"step": "results_match", "groups": len(bkt_rows)}))
    spark.stop()


if __name__ == "__main__":
    main()
