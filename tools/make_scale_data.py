#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing testdata dir.

Replicates each table ``factor`` times with consistent key offsets so all
foreign-key joins (orders->customer, lineitem->orders/part/supplier,
events.user_id, documents.doc_id, embeddings.vec_id) keep working, while
keeping per-copy *content* distinct where duplicate density matters:

- documents: each copy appends ceil(n_tokens/15)+1 copy-unique filler
  tokens, pushing cross-copy Jaccard below the 0.9 near-dup threshold —
  duplicate DENSITY stays ~constant as a real larger corpus would, only
  volume grows.
- embeddings: each copy circularly rotates the vector by ``copy`` slots —
  random vectors stay random, cross-copy cosine stays ~orthogonal.
- region/nation: global dims, not replicated.

Usage: python tools/make_scale_data.py SRC_DIR OUT_DIR FACTOR [--tables t1,t2]

``--tables`` restricts generation to a subset (e.g. documents,embeddings
for dedup/ANN scale validation at factors where replicating lineitem
would dominate runtime for no benefit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OFFSET = 100_000_000  # > any key at the source scale


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    wanted = None
    if "--tables" in sys.argv:
        wanted = set(sys.argv[sys.argv.index("--tables") + 1].split(","))
    from reddit_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make_scale_data")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def rep(table: str, shift_cols: list[str], transform=None):
        if wanted is not None and table not in wanted:
            return
        base = spark.read.parquet(f"{src}/{table}.parquet")
        copies = []
        for i in range(factor):
            c = base
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            if transform is not None and i > 0:
                c = transform(c, i)
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {factor}x written")

    def doc_perturb(df, i):
        n_tok = F.size(F.split(F.trim("text"), r"\s+"))
        fillers = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (n_tok / 15).cast("int") + 1),
                lambda j: F.concat(F.lit(f"zcp{i}x"), j.cast("string")),
            ),
        )
        new_text = F.concat(F.col("text"), F.lit(" "), fillers)
        return df.withColumn("text", new_text).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    def emb_rotate(df, i):
        k = i % 64
        rotated = F.concat(
            F.slice("embedding", k + 1, 64 - k), F.slice("embedding", 1, k)
        )
        return df.withColumn("embedding", rotated)

    for t in ("region", "nation"):
        if wanted is not None and t not in wanted:
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    rep("customer", ["c_custkey"])
    rep("supplier", ["s_suppkey"])
    rep("part", ["p_partkey"])
    rep("orders", ["o_orderkey", "o_custkey"])
    rep("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    rep("events", ["event_id", "user_id"])
    rep("documents", ["doc_id"], doc_perturb)
    rep("embeddings", ["vec_id"], emb_rotate)
    print("done:", out)


if __name__ == "__main__":
    main()
