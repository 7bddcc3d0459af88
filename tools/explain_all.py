#!/usr/bin/env python
"""Dump the formatted physical plan of every driver query to
tools/plans/<name>.txt — the review artifact for plan-quality iteration
(pushdown, pruning, join strategies, codegen spans).

Usage: python tools/explain_all.py [sf_dir]
Streaming queries are skipped (their plans only exist per-microbatch).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# every stream_* query: the returned DataFrame is the post-run file-sink
# read-back, so its "plan" is just a parquet scan — nothing to review
SKIP_PREFIX = "stream_"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans")
    os.makedirs(out_dir, exist_ok=True)

    from reddit_etl_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="explain_all", shuffle_partitions=8)
    for name, fn in entrymod.queries().items():
        if name.startswith(SKIP_PREFIX):
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{out_dir}/{name}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}")
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
