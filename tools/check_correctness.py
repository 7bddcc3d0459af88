#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares:
  - row count
  - column-name set
  - order-independent value hash (columns sorted by name, rows sorted,
    floats rounded to 6 dp, timestamps truncated to microseconds)

Usage: python tools/check_correctness.py [sf_dir] [--only k1,k2,...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):  # pandas DataFrame -> canonical row tuples
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6).map(lambda v: "%.6f" % v if v == v else "nan")
        else:
            df[c] = s.astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> None:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from reddit_etl_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle; rows-only check)")
            if len(sdf) == 0:
                print(f"  WARN {name}: 0 rows from rows-only query")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if set(sdf.columns) != set(odf.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        (ns, hs), (no, ho) = normalize(sdf), normalize(odf)
        status = "ok  " if (ns, hs) == (no, ho) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={ns} rows [{hs}]  oracle={no} rows [{ho}]")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
