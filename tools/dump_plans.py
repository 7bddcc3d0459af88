#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/r10/.

Usage: python tools/dump_plans.py <suffix> [q1,q2,...]

Writes plans/r10/<query>_<suffix>.txt for each query (default: all
queries()). Plan generation is driver-side; store-backed queries build
their store on first touch, so this is not free for those — run it
serialized with other Spark work like any measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from reddit_etl_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name, fn in entrymod.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
