#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output: a full per-query detail JSON line, then a compact FINAL summary
line (total / n / sf / slowest-queries map, <=1.5 KB) — the driver tails
the last 2 KB of stdout and parses the last line, so the total must sit
entirely inside that window (BENCH_r03 lost its total to a single >2 KB
line).

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect bottleneck for wide results).

SPARK_GRAFT_BENCH_FULL=1 widens the run from the headline set to every
``queries()`` key — run once per round so the long tail (asof variants,
gapfill, SCD-2, media, pii, the stream join family, ...) has a
regression tripwire too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixed-work CPU calibration probe: 50M xxhash64 folds on all worker
# threads — constant cost regardless of SF, pure JVM codegen, no I/O.
# PROBE_FLOOR_S is the QUIETEST best-of-3 observed on this host
# (round 9: 0.12 s at loadavg ~0; a window that "looked idle" at
# loadavg 2 still measured 0.40-0.48 — hidden steal is exactly what the
# probe exists to expose). A run whose probe exceeds 2x this floor ran
# on a degraded host (the round-8 failure mode: both committed r8 bench
# artifacts were 2-12x inflated by host steal with identical plans) and
# must not be used as a regression baseline. The probe runs before AND
# after the query loop so degradation that starts or ends mid-run is
# also visible.
PROBE_ROWS = 50_000_000
PROBE_FLOOR_S = 0.12


def calibration_probe(spark, reps: int = 3) -> float:
    """Best-of-``reps`` wall seconds for the fixed xxhash64 fold."""
    from pyspark.sql import functions as F

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        # bit_xor fold: overflow-free under ANSI mode, uncollapsible by
        # the optimizer, and the hash work dominates the aggregate
        spark.range(PROBE_ROWS, numPartitions=n_workers).select(
            F.xxhash64("id").alias("h")
        ).agg(F.expr("bit_xor(h)")).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def warm_probe(spark) -> None:
    """One DISCARDED probe rep before the first real bracketing probe.

    Measured (round 10): in a fresh session the first probe reps read
    0.16-0.4 s and decay to the 0.11-0.12 s floor by rep ~3 — JIT/codegen
    warm-up of the probe pipeline itself, not host steal (reproduced on
    an otherwise-quiet host; by the second probe call the same session
    reads the floor). Without this, the FIRST chunk of every stitched
    invocation is bracketed by a handicapped probe_before and can loop
    "degraded" forever, and plain-mode probe_before is biased high the
    same way."""
    calibration_probe(spark, reps=2)


def _time_queries(spark, queries, names, reps) -> dict[str, float]:
    """Best-of-``reps`` wall seconds per query, noop-sink forced,
    clearCache isolation between reps/queries (the house policy)."""
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # operators may cache intermediates (multi-use subplans); drop
            # them so reps and queries are measured in isolation, not
            # under the previous run's memory pressure
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    return timings


def run_stitched(spark, queries, names, reps, state_path, out_path) -> None:
    """PER-QUERY PROBE-BRACKETED STITCHING — how this host ever yields a
    clean full-surface baseline (round-9 finding: the host's hidden-steal
    windows oscillate faster than one ~17-minute monolithic run, so a
    single-run probe bracket can never come back clean; round-10 used
    ~20-query chunk brackets, whose committed per-query rows were still
    ±2-3x untrustworthy because a steal window INSIDE a chunk survives
    the bracket — the round-10 verdict's item 2).

    Protocol: one calibration probe between consecutive queries; query i
    is kept only when BOTH its surrounding probes are <= 2x the committed
    floor. Dirty queries re-run on later invocations (state persists in
    ``state_path``) until every query is clean, at which point the merged
    artifact — every per-query row individually probe-bracketed,
    degraded=false BY CONSTRUCTION — is written to ``out_path``. Probe
    overhead: ~0.5 s per query (~2 min over the full 216-query surface),
    and the probe between two queries serves as probe_after for the first
    and probe_before for the second."""
    warm_probe(spark)
    state: dict = {"queries": {}}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)
        if "queries" not in state:  # pre-round-11 chunk-format state
            state = {"queries": {}}
    live = set(names)
    state["queries"] = {
        k: v for k, v in state["queries"].items() if k in live
    }
    pending = [
        n for n in names
        if not state["queries"].get(n, {}).get("clean")
    ]
    probe = calibration_probe(spark)
    dirty_streak = 0
    for name in pending:
        if probe > 2 * PROBE_FLOOR_S:
            # host degraded — don't burn time on a doomed bracket; take a
            # fresh reading and give up for this invocation if it persists
            dirty_streak += 1
            if dirty_streak >= 3:
                print(json.dumps({"stitch_abort_probe": probe}))
                break
            time.sleep(2)
            probe = calibration_probe(spark)
            if probe > 2 * PROBE_FLOOR_S:
                continue
        pb = probe
        timing = _time_queries(spark, queries, [name], reps)[name]
        probe = calibration_probe(spark)  # probe_after == next probe_before
        clean = max(pb, probe) <= 2 * PROBE_FLOOR_S
        if clean:
            dirty_streak = 0
        state["queries"][name] = {
            "sec": timing,
            "probe_before_s": pb,
            "probe_after_s": probe,
            "clean": clean,
        }
        with open(state_path, "w") as fh:
            json.dump(state, fh, indent=1)
        print(json.dumps({"query": name, "sec": timing, "clean": clean,
                          "probes": [pb, probe]}))
    done = [n for n in names if state["queries"].get(n, {}).get("clean")]
    all_clean = len(done) == len(names)
    merged = {
        n: state["queries"][n]["sec"]
        for n in names
        if n in state["queries"]
    }
    total = round(sum(merged.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = -1.0
    artifact = {
        "metric": "headline_queries_detail",
        "value": total,
        "unit": "sec",
        "n": len(merged),
        "stitched": True,
        "per_query_probes": True,
        "queries_clean": len(done),
        "queries_total": len(names),
        "stream_slices": os.environ.get("SPARK_GRAFT_STREAM_SLICES"),
        "probe": {
            "floor_s": PROBE_FLOOR_S,
            "degraded": not all_clean,
            "per_query": {
                n: [
                    state["queries"][n]["probe_before_s"],
                    state["queries"][n]["probe_after_s"],
                ]
                for n in names
                if n in state["queries"]
            },
        },
        "queries": merged,
        "sf": sf,
    }
    if all_clean and out_path:
        with open(out_path, "w") as fh:
            json.dump(artifact, fh, indent=1)
            fh.write("\n")
    print(json.dumps({
        "metric": "stitch_progress",
        "clean_queries": len(done),
        "total_queries": len(names),
        "complete": all_clean,
        "value": total,
        "unit": "sec",
        "n": len(merged),
    }))


def main() -> None:
    from reddit_etl_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # warm-up: JVM/codegen spin-up and parquet footer reads are session
    # costs, not query costs — touch each table once before timing
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).collect()
    # python-worker pool + Arrow + numpy imports are likewise session
    # costs; without this the first mapInPandas query eats ~10s of
    # one-time worker spawn
    def _warm_workers(batches):
        import numpy  # noqa: F401  (preload into each worker)

        yield from batches

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000, numPartitions=n_workers).mapInPandas(
        _warm_workers, "id long"
    ).count()

    # headline set: the reference's canonical surface + joins/windows +
    # the LLM-data operators, heaviest variants included
    headline = [
        "summary_by_type",
        "staging_projection",
        "topk_orders",
        "group_having",
        "hourly_stats",
        "latest_event_per_user_type",
        "pricing_summary",
        "revenue_by_nation",
        "top_customers_per_nation",
        "running_order_total",
        "sessionize",
        "purchase_asof_click",
        "purchase_clicks_window",
        "big_spenders_sql",
        "rollup_revenue",
        "events_pivot",
        "value_percentiles",
        "dedup_exact",
        "text_stats",
        "bpe_token_stats",
        "lang_id_rollup",
        "repetition_stats",
        "tfidf_keywords",
        "sequence_pack",
        "contamination_check",
        "jaccard_pairs",
        "minhash_neardup",
        "simhash_neardup",
        "cosine_topk",
        "embedding_neardup_lsh",
        "media_byte_stats",
        "media_decode_stats",
        "exact_distinct_stats",
        "cohort_retention",
        "funnel_conversion",
        "shipping_priority",
        "spend_deciles_by_nation",
        "stats_moments",
        "duplicate_span_stats",
        "ngram_frequency",
        "shard_manifest",
        "stream_hourly_counts",
        "stream_sessionize",
        "stream_distinct_users",
        "small_quantity_revenue",
        "order_count_distribution",
        "returned_items_report",
        "vocab_oov_stats",
        "kmeans_cluster_stats",
        "stream_session_window",
        "top_value_parts",
        "promo_revenue_share",
        "dominant_suppliers",
        "large_order_customers",
        "disjunctive_promo_revenue",
        "idle_customer_balance",
        "grouping_sets_revenue",
        "state_history_scd2",
        "temperature_mix",
        "token_budget_sample",
        "neardup_canonical",
        "cosine_topk_ivfpq",
        "stream_sliding_counts",
        "stream_static_enrich",
        "dq_report",
        "batch_session_window",
        "purchase_next_click",
        "chunk_manifest",
        "min_cost_supplier",
        "nation_trade_volume",
        "bigram_pmi",
        "market_share",
        "product_profit",
        "forecast_revenue",
        "supplier_part_variety",
        "cosine_topk_pq",
        "incremental_dedup",
        "nb_lang_confusion",
        "local_supplier_volume",
        "ship_latency_priority",
        "top_supplier",
        "lm_perplexity_buckets",
        "dsir_selection",
        "stream_incremental_dedup",
        "bpe_vocab_stats",
        "knn_label_confusion",
        "value_anomalies",
        "line_dedup_rewrite",
        "duplicate_span_rewrite",
        "duplicate_span_rewrite_v2",
        "c4_filter_stats",
        "sentiment_rollup",
        "train_val_test_split",
        "semantic_dedup_learned",
        "cdc_chunk_stats",
        "winnow_overlap",
        "neardup_canonical_minhash",
        "approx_distinct_stats",
        "part_triangles",
        "part_triangles_approx",
        "cms_heavy_hitters",
        "bloom_contamination_stats",
        "fuzzy_resolve_customers",
        "stream_approx_distinct",
        "bm25_doc_search",
        "stream_cms_heavy_users",
        "part_kcore",
        "part_clustering_coeff",
        "part_communities",
        "part_seed_distances",
        "stream_bloom_contamination",
        "stream_bm25_doc_search",
        "value_quantiles",
        "stream_value_quantiles",
        "hll_user_overlap",
        "basket_rules_parts",
        "hybrid_doc_search",
        "value_drift_by_type",
        "ann_recall_eval",
        "nb_lang_auc",
        "readability_stats",
        "stream_value_drift",
        "session_attribution",
        "sketch_store_distinct_users",
        "sketch_store_quantiles",
        "sketch_store_heavy_users",
        "sketch_store_drift",
        "part_components",
        "weighted_sample",
        "hybrid_doc_search_lsh",
        "purchase_state_pit",
        "stream_sketch_store",
        "snapshot_diff_docs",
        "daily_count_anomalies",
        "stream_purchase_state_pit",
        "sketch_store_window_users",
        "part_community_modularity",
        "rollup_store_revenue",
        "supplier_blame_report",
        "kmv_distinct_users",
        "stream_kmv_distinct",
        "kmv_user_jaccard",
        "kmv_sample_users",
        "weighted_sample_by_lang",
        "part_degree_hist",
        "ann_store_topk",
        "ann_store_topk_lsh",
        "stream_part_components",
        "kmv_value_quantiles",
        "stream_graph_store",
        "stream_ann_store",
        "domain_rollup",
        "url_canonical_sample",
        "churn_hazard_censored",
        "stream_domain_rollup",
        "domain_capped_docs",
        "ann_store_topk_pq",
        "neardup_store_pairs",
        "stream_minhash_store",
        "leakage_safe_split",
    ]

    # full-surface mode: time EVERY queries() key (headline first, the
    # long tail after, each once per rep policy) — the per-round
    # regression tripwire for the ~35 queries outside the headline set.
    # The FINAL summary line already self-truncates to <=1.5 KB.
    if os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        headline = headline + sorted(k for k in queries if k not in set(headline))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

    # stitch mode: probe-bracketed chunks merged across invocations into
    # a clean-by-construction committed artifact (see run_stitched)
    stitch_state = os.environ.get("SPARK_GRAFT_BENCH_STITCH")
    if stitch_state:
        run_stitched(
            spark, queries, headline, reps, stitch_state,
            os.environ.get("SPARK_GRAFT_BENCH_JSON"),
        )
        spark.stop()
        return

    # best-of-N (default 2): single-shot wall at sf0.1 swings within the
    # ±50% machine-noise policy, which makes round-over-round deltas
    # mushy; the min of two cold-cache runs strips scheduler/GC spikes
    # while still measuring full computation (clearCache between reps, so
    # rep 2 is not a cache readback)
    warm_probe(spark)
    probe_before = calibration_probe(spark)

    timings = _time_queries(spark, queries, headline, reps)

    probe_after = calibration_probe(spark)
    # self-diagnosis: >2x the committed healthy-host floor on either
    # side of the run marks the whole artifact untrustworthy for
    # regression comparison (see PROBE_FLOOR_S)
    degraded = max(probe_before, probe_after) > 2 * PROBE_FLOOR_S
    probe = {
        "before_s": probe_before,
        "after_s": probe_after,
        "floor_s": PROBE_FLOOR_S,
        "degraded": degraded,
    }

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = -1.0  # non-standard dir name (e.g. synthesized scale data)
    # Per-query map first (large line — useful in raw logs), then the
    # compact summary as the FINAL line: the driver captures the last
    # ~2 KB of stdout and parses the last line as the bench JSON, so the
    # total must fit entirely inside that tail window.
    detail = {
        "metric": "headline_queries_detail",
        "value": total,
        "unit": "sec",
        "n": len(timings),
        "probe": probe,
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(detail))
    # SPARK_GRAFT_BENCH_JSON=path: write the UNTRUNCATED per-query detail
    # as the committed artifact (every query gets a regression baseline —
    # the FINAL stdout line below self-truncates to the slowest entries
    # for the driver's 2 KB tail and must not be committed as the record)
    out_path = os.environ.get("SPARK_GRAFT_BENCH_JSON")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])
    )
    final = None
    while True:
        final = json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "n": len(timings),
                "sf": sf,
                "probe": probe,
                "queries": slowest,
            },
            separators=(",", ":"),
        )
        if len(final) <= 1500 or not slowest:
            break
        slowest.pop(next(reversed(slowest)))  # drop the fastest entry
    print(final)
    spark.stop()


if __name__ == "__main__":
    main()
