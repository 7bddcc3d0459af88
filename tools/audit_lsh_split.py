#!/usr/bin/env python
"""LSH hub-bucket audit: occupancy distribution and candidate-pair volume
of the embedding near-dup bucketing, WITHOUT vs WITH hot-bucket splitting
(similarity.split_hot_buckets).

The quantity that decides 100 TB survival is candidate-pair volume per
bucket (quadratic in occupancy): auto_planes keeps the MEAN flat, the
splitter bounds the MAX. This prints one JSON line per mode so the
DEPLOYMENT.md table can be regenerated at any scale.

Usage: python tools/audit_lsh_split.py EMB_DIR [--cap 256] [--tables 8]
       (EMB_DIR contains embeddings.parquet; e.g. /root/testdata/sf0.1
        or a make_scale_data.py output dir)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    emb_dir = sys.argv[1]
    cap = int(sys.argv[sys.argv.index("--cap") + 1]) if "--cap" in sys.argv else 256
    n_tables = (
        int(sys.argv[sys.argv.index("--tables") + 1])
        if "--tables" in sys.argv
        else 8
    )

    from reddit_etl_pipeline_spark.operators import similarity as S
    from reddit_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="audit_lsh_split")
    df = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
    n = df.count()
    dim = len(df.select("embedding").first()[0])
    n_planes = S.auto_planes(n)

    def stats(b, key):
        occ = b.groupBy(*key).agg(F.count(F.lit(1)).alias("n"))
        agg = occ.agg(
            F.count(F.lit(1)).alias("buckets"),
            F.mean("n").alias("mean"),
            F.max("n").alias("max"),
            # candidate pairs = sum n*(n-1)/2 per bucket (before the
            # cross-table distinct; the per-bucket quadratic cost driver)
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand_pairs"),
        ).first()
        return {
            "buckets": agg["buckets"],
            "mean_occ": round(agg["mean"], 1),
            "max_occ": agg["max"],
            "cand_pairs": int(agg["cand_pairs"]),
        }

    base = S.lsh_bucket_table(
        df, dim, n_planes, n_tables, extra_bits=16
    ).localCheckpoint()
    r0 = stats(base, ["tbl", "bucket"])
    r0.update({"mode": "no_split", "rows": n, "planes": n_planes})
    print(json.dumps(r0))

    split = S.split_hot_buckets(base, cap, extra_bits=16)
    r1 = stats(split, ["tbl", "bucket", "lvl", "sub"])
    r1.update({"mode": f"split_cap{cap}", "rows": n, "planes": n_planes})
    print(json.dumps(r1))
    spark.stop()


if __name__ == "__main__":
    main()
