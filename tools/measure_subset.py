#!/usr/bin/env python
"""Probe-bracketed isolated timing for a subset of declared queries —
the per-change A/B harness of the optimization rounds (bench.py
methodology: warm-up, noop sink, best-of-2, clearCache isolation,
calibration probes before/after so a steal window can't masquerade as
a regression or a win).

Usage: python tools/measure_subset.py q1,q2,... [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from reddit_etl_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    from reddit_etl_pipeline_spark.plans import star

    spark = get_spark(app_name="measure_subset")
    # warm via the blessed loader so the A/B harness inherits exactly the
    # session/loader configuration bench.py and the driver gate use
    # (nanosAsLong, UTC) rather than re-pinning confs by hand
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        star.load(spark, bench.SF_DIR, t).limit(1).collect()

    def _warm_workers(batches):
        import numpy  # noqa: F401

        yield from batches

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000, numPartitions=n_workers).mapInPandas(
        _warm_workers, "id long"
    ).count()

    queries = entrymod.queries()
    bench.warm_probe(spark)
    pb = bench.calibration_probe(spark)
    timings = bench._time_queries(spark, queries, names, reps)
    pa = bench.calibration_probe(spark)
    print(json.dumps({
        "probes": [pb, pa],
        "floor": bench.PROBE_FLOOR_S,
        "clean": max(pb, pa) <= 2 * bench.PROBE_FLOOR_S,
        "queries": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
