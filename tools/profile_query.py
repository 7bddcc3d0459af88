#!/usr/bin/env python
"""Per-query resource profile: run one (or more) driver queries and report
stage-aggregated input bytes, shuffle read/write, spill, and task time
from the Spark UI REST API — the numbers that predict 100 TB behavior
(a query whose shuffle write ~ its input does a full reshuffle; one whose
spill is nonzero needs bigger partitions or more of them).

Usage: python tools/profile_query.py QUERY [QUERY ...] [--sf SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print(__doc__)
        sys.exit(2)

    from reddit_etl_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="profile_query", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = entrymod.queries()

    for name in args:
        if name not in queries:
            print(f"unknown query: {name}")
            continue
        before = {
            s["stageId"]
            for s in _get(f"{ui}/api/v1/applications/{app_id}/stages")
        }
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        # small settle so the UI store catches up with the last stage
        time.sleep(0.5)
        stages = [
            s
            for s in _get(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
            if s["stageId"] not in before
        ]
        agg = {
            "stages": len(stages),
            "tasks": sum(s["numCompleteTasks"] for s in stages),
            "input_mb": sum(s["inputBytes"] for s in stages) / 2**20,
            "shuffle_read_mb": sum(s["shuffleReadBytes"] for s in stages) / 2**20,
            "shuffle_write_mb": sum(s["shuffleWriteBytes"] for s in stages) / 2**20,
            "spill_disk_mb": sum(s["diskBytesSpilled"] for s in stages) / 2**20,
            "spill_mem_mb": sum(s["memoryBytesSpilled"] for s in stages) / 2**20,
            "task_time_s": sum(s["executorRunTime"] for s in stages) / 1000,
        }
        print(
            f"{name}: wall={wall:.2f}s stages={agg['stages']} "
            f"tasks={agg['tasks']} input={agg['input_mb']:.1f}MB "
            f"shuffle_r={agg['shuffle_read_mb']:.1f}MB "
            f"shuffle_w={agg['shuffle_write_mb']:.1f}MB "
            f"spill_disk={agg['spill_disk_mb']:.1f}MB "
            f"task_time={agg['task_time_s']:.1f}s"
        )


if __name__ == "__main__":
    main()
