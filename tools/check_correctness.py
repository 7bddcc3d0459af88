#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares:
  - row count
  - column-name set
  - order-independent value hash (columns sorted by name, rows sorted,
    floats rounded to 6 dp, timestamps truncated to microseconds)

Usage: python tools/check_correctness.py [sf_dir] [--only k1,k2,...]
                                         [--json OUT.json]

``--json`` additionally writes a driver-shaped artifact (one entry per
query: rows/schema/hash match booleans + row counts) — commit it as
CORRECTNESS_local.json so reviewers can see the last full-sweep result
even when the driver's own gate samples a subset.
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
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
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
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"spark: {e}"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        rec["spark_rows"] = len(sdf)
        if name not in oracles:
            rec["err"] = "no_oracle"
            print(f"rows  {name}: {len(sdf)} rows (no oracle; rows-only check)")
            if len(sdf) == 0:
                print(f"  WARN {name}: 0 rows from rows-only query")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"duckdb: {e}"
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        rec["oracle_rows"] = len(odf)
        rec["schema_match"] = set(sdf.columns) == set(odf.columns)
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        (ns, hs), (no, ho) = normalize(sdf), normalize(odf)
        rec["rows_match"] = ns == no
        rec["hash_match"] = (ns, hs) == (no, ho)
        status = "ok  " if rec["hash_match"] else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={ns} rows [{hs}]  oracle={no} rows [{ho}]")

    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
