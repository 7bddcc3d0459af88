#!/usr/bin/env python
"""IVF inverted-list audit: occupancy balance and probed-candidate volume
of the integer-grid coarse quantizer (similarity.train_ivf_grid_centroids)
at any corpus scale.

What decides 100 TB survival for IVF is (a) list balance — a hub list
approaching the corpus size degrades the probe to a scan — and (b) the
probed fraction: with nprobe of n_centroids lists, a query should touch
~nprobe/n_centroids of the corpus. This prints one JSON line per scale
so DEPLOYMENT.md tables can be regenerated.

Usage: python tools/audit_ivf_lists.py EMB_DIR [--centroids 16] [--nprobe 4]
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
    k = (
        int(sys.argv[sys.argv.index("--centroids") + 1])
        if "--centroids" in sys.argv
        else 16
    )
    nprobe = (
        int(sys.argv[sys.argv.index("--nprobe") + 1])
        if "--nprobe" in sys.argv
        else 4
    )
    sample = (
        int(sys.argv[sys.argv.index("--sample") + 1])
        if "--sample" in sys.argv
        else 512
    )

    import numpy as np
    import pandas as pd

    from reddit_etl_pipeline_spark.operators import similarity as S
    from reddit_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="audit_ivf_lists")
    df = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
    cents = S.train_ivf_grid_centroids(df, k, sample_size=sample)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            u = S._unit_grid(np.stack(pdf["embedding"].to_numpy()))
            yield pd.DataFrame(
                {"cid": S._grid_assign_topn(u, cents, 1)[:, 0]}
            )

    occ = (
        df.select("embedding")
        .mapInPandas(assign, "cid long")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = sorted((r["n"] for r in occ), reverse=True)
    rows = sum(counts)
    # probed volume if every corpus vector queried its nprobe nearest
    # lists: upper bound = the nprobe largest lists
    probed_worst = sum(counts[:nprobe])
    print(
        json.dumps(
            {
                "rows": rows,
                "lists": len(counts),
                "mean_occ": round(rows / max(len(counts), 1), 1),
                "max_occ": counts[0],
                "max_over_mean": round(
                    counts[0] / (rows / max(len(counts), 1)), 2
                ),
                "probed_frac_mean": round(nprobe / max(len(counts), 1), 3),
                "probed_frac_worst": round(probed_worst / rows, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
