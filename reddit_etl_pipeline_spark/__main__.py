"""Command-line entrypoint — the reference's script surface as one CLI.

The reference is operated as date-keyed scripts chained by the DAG
(``extract-from-reddit.py`` / ``upload_to_s3.py`` / ``s3_to_redshift.py``
each take the YYYYMMDD batch key, ``s3_to_redshift.py:139``); this CLI is
the same operational surface against the Spark-native engine:

    python -m reddit_etl_pipeline_spark daily    --date 20250318 \
        --lake /data/lake --warehouse /data/wh [--conf configuration.conf]
    python -m reddit_etl_pipeline_spark backfill --dates 20250318,20250320 ...
    python -m reddit_etl_pipeline_spark curate   --input /data/lake/docs \
        --output /data/curated [--min-quality 0.45] [--lm-tail-drop]
    python -m reddit_etl_pipeline_spark compact  --path /data/wh
    python -m reddit_etl_pipeline_spark vacuum   --path /data/lake \
        --keep-days 30 --as-of 20250324

``--conf`` points at a reference-shaped configuration.conf: reddit
credentials build the live HTTP client, the aws bucket becomes the
``s3a://`` lake root when ``--lake`` is omitted. ``--fake-source N``
swaps in the deterministic offline source (tests, dry runs, sandboxes).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m reddit_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    daily = sub.add_parser("daily", help="one end-to-end daily batch")
    backfill = sub.add_parser("backfill", help="ordered multi-day catchup")
    for sp in (daily, backfill):
        sp.add_argument("--lake", help="lake root (defaults to conf s3a bucket)")
        sp.add_argument("--warehouse", required=True)
        sp.add_argument("--conf", help="reference-shaped configuration.conf")
        sp.add_argument("--subreddit", default="stocks")
        sp.add_argument("--time-filter", default="week")
        sp.add_argument("--limit", type=int, default=1000)
        sp.add_argument(
            "--fake-source",
            type=int,
            metavar="N",
            help="use the deterministic offline source with N posts",
        )
    daily.add_argument("--date", required=True, help="YYYYMMDD batch key")
    daily.add_argument(
        "--stage",
        choices=["all", "extract", "load", "upsert", "models"],
        default="all",
        help="run one DAG task instead of the whole batch (the Airflow "
        "DAG in airflow/dags/reddit_pipeline_spark.py runs the four "
        "stages as separate processes with per-stage retries)",
    )
    daily.add_argument(
        "--staging",
        help="day-file staging root for staged runs "
        "(default: <lake>__staging)",
    )
    backfill.add_argument(
        "--dates", required=True, help="comma-separated YYYYMMDD list, in order"
    )

    compact = sub.add_parser("compact", help="small-file compaction")
    compact.add_argument("--path", required=True)
    compact.add_argument(
        "--target-file-mb", type=int, default=128, help="output file size target"
    )

    cur = sub.add_parser(
        "curate",
        help="corpus curation: dedup + quality/language gate + PII scrub",
    )
    cur.add_argument("--input", required=True, help="documents parquet path")
    cur.add_argument(
        "--conf", help="configuration.conf for s3a credentials on lake paths"
    )
    cur.add_argument("--output", required=True, help="curated output path")
    cur.add_argument("--min-quality", type=float, default=0.45)
    cur.add_argument("--neardup-threshold", type=float, default=0.9)
    cur.add_argument(
        "--keep",
        choices=["first", "best"],
        default="first",
        help="near-dup cluster representative: first (lowest id) or "
        "best (highest quality score)",
    )
    cur.add_argument(
        "--neardup",
        choices=["exact", "minhash"],
        default="exact",
        help="near-dup pair graph: exact Jaccard PPJoin (verification "
        "baseline) or banded MinHash-LSH (bucket-bounded candidates — "
        "the corpus-scale path)",
    )
    cur.add_argument(
        "--c4-rules",
        action="store_true",
        help="also apply the C4 format filter (retained-line rules)",
    )
    cur.add_argument(
        "--lm-tail-drop",
        action="store_true",
        help="also drop each language's worst-perplexity tercile",
    )
    cur.add_argument(
        "--url-col",
        help="URL column enabling the domain gate (canonical-domain "
        "blocklist + per-domain cap as the first curation stage)",
    )
    cur.add_argument(
        "--block-domain",
        action="append",
        default=[],
        metavar="DOMAIN",
        help="canonical domain to drop entirely (repeatable)",
    )
    cur.add_argument(
        "--domain-cap",
        type=int,
        help="keep at most this many (lowest-id) docs per domain",
    )

    vac = sub.add_parser("vacuum", help="drop lake partitions past retention")
    vac.add_argument("--path", required=True)
    vac.add_argument("--keep-days", type=int, required=True)
    vac.add_argument("--as-of", required=True, help="YYYYMMDD")
    return p


def _fetcher_factory(args, cfg):
    """date -> fetcher callable, from --fake-source or conf credentials.
    The live path carries the reference's 1 s/100-posts throttle
    (extract-from-reddit.py:85-88) — the fake source doesn't, so tests
    and dry runs stay fast."""
    if args.fake_source is not None:
        from .sources.reddit_api import FakeRedditSource

        return lambda date: FakeRedditSource(
            subreddit=args.subreddit, n=args.fake_source, day=int(date) % 7
        )
    if cfg is None:
        raise SystemExit(
            "either --conf (live Reddit credentials) or --fake-source is required"
        )
    from .sources.reddit_api import throttled
    from .sources.reddit_http import client_from_config

    client = client_from_config(cfg)

    def fetcher_for(date):
        return lambda: throttled(
            client.top(args.subreddit, time_filter=args.time_filter, limit=args.limit)
        )

    return fetcher_for


def _lake_root(args, cfg) -> str:
    if args.lake:
        return args.lake
    if cfg is not None:
        return cfg.lake_root()
    raise SystemExit("--lake is required without --conf")


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "vacuum":  # driver-side only: no Spark session needed
        from .sources.lake import vacuum_table

        dropped = vacuum_table(args.path, args.keep_days, args.as_of)
        print(json.dumps({"dropped_partitions": dropped}))
        return 0

    cfg = None
    if getattr(args, "conf", None):
        from .config import load_config

        cfg = load_config(args.conf)

    from .session import get_spark

    # conf-driven runs need the s3a credentials/region on the session
    # (config.py spark_s3_conf) or the s3a:// lake write can't authenticate
    spark = get_spark(
        app_name=f"reddit_etl_{args.cmd}",
        extra_conf=cfg.spark_s3_conf() if cfg else None,
    )
    if args.cmd == "curate":
        from .plans.curation import curate_corpus

        report = curate_corpus(
            spark,
            args.input,
            args.output,
            min_quality=args.min_quality,
            neardup_threshold=args.neardup_threshold,
            c4_rules=args.c4_rules,
            lm_tail_drop=args.lm_tail_drop,
            keep=args.keep,
            neardup_method=args.neardup,
            url_col=args.url_col,
            domain_blocklist=args.block_domain or None,
            domain_cap=args.domain_cap,
        )
        print(json.dumps(report))
        return 0

    if args.cmd == "compact":
        from .sources.lake import compact_table

        n = compact_table(
            spark, args.path, target_file_bytes=args.target_file_mb * 1024 * 1024
        )
        print(json.dumps({"output_files": n}))
        return 0

    fetchers = _fetcher_factory(args, cfg)
    lake = _lake_root(args, cfg)
    from .plans.pipeline import run_backfill, run_daily_batch

    if args.cmd == "daily":
        if args.stage != "all":
            from .plans import pipeline as P

            staging = args.staging or (lake.rstrip("/") + "__staging")
            if args.stage == "extract":
                audits = P.stage_extract(
                    spark, fetchers(args.date), staging, args.date
                )
            elif args.stage == "load":
                audits = P.stage_load_lake(spark, staging, lake, args.date)
            elif args.stage == "upsert":
                audits = P.stage_load_warehouse(
                    spark, lake, args.warehouse, args.date
                )
            else:
                audits = P.stage_models(spark, args.warehouse)
            print(json.dumps({args.date: {args.stage: audits}}, default=str))
            return 0
        audits = run_daily_batch(
            spark, fetchers(args.date), lake, args.warehouse, args.date
        )
        print(json.dumps({args.date: audits}, default=str))
    else:
        results = run_backfill(
            spark, fetchers, lake, args.warehouse, args.dates.split(",")
        )
        print(json.dumps(results, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
