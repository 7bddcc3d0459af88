"""One-command corpus curation — the training-data build the individual
operators exist for, composed as an operational driver:

    raw docs → exact dedup → near-dup keep-one → quality / language gate
             → (optional) C4 format rules → PII scrub
             → (optional) LM perplexity tail drop → curated

Each stage is one of the repo's verified operators (operators/dedup.py,
functions/text.py, functions/pii.py, operators/lm.py); this module only
sequences them, counts survivors, and writes the result — the
`python -m reddit_etl_pipeline_spark curate` subcommand a user runs
instead of the reference's ad-hoc pandas filters.

Scale notes: stage order is cheapest-reduction-first (exact dedup is one
fingerprint shuffle and typically removes the most volume), each stage's
output feeds the next as a plan (no materialization besides one
localCheckpoint after the join-heavy near-dup stage, which cuts lineage
exactly like the operators' own internals), and the LM tail drop uses the
SAMPLED-cutoff production path (operators/lm.bucket_thresholds) — a
map-side comparison, never a per-language NTILE sort of the corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import scrub_pii
from ..functions.text import detect_language_df, quality_score
from ..operators import dedup as D
from ..operators import lm as LM


def curate_corpus(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.45,
    neardup_threshold: float = 0.9,
    c4_rules: bool = False,
    lm_tail_drop: bool = False,
    keep: str = "first",
    neardup_method: str = "exact",
    url_col: str | None = None,
    domain_blocklist: list[str] | None = None,
    domain_cap: int | None = None,
) -> dict:
    """Run the curation chain over a parquet documents table and write
    the surviving docs (PII-scrubbed text, plus ``lang_pred`` and
    ``quality`` columns) to ``output_path``. Returns the per-stage
    survivor counts the ingest dashboard tracks.

    ``keep`` selects the near-dup cluster representative: ``"first"``
    keeps the lowest id (neardup_clusters), ``"best"`` the
    highest-quality member (neardup_canonical) — prefer ``best`` when
    replicas differ in cleanliness (boilerplate-stripped mirrors etc.).

    ``neardup_method`` picks the near-dup pair graph: ``"exact"``
    (exact-Jaccard PPJoin — the verification baseline) or ``"minhash"``
    (banded MinHash-LSH — bucket-bounded candidates, the corpus-scale
    path; CLI flag ``--neardup minhash``).

    ``url_col`` + ``domain_blocklist`` / ``domain_cap`` enable the
    DOMAIN gate (C4/RefinedWeb-style source curation) as the very first
    stage — it is the cheapest reduction of all (a map-side canonical-
    domain projection, one broadcast anti-join against the blocklist,
    and a per-domain row_number cap keeping the ``domain_cap``
    lowest-id docs per domain — deterministic, skew-bounded by the cap
    itself), so it runs before any fingerprint shuffle."""
    docs = spark.read.parquet(input_path)
    report = {"input": docs.count()}

    if url_col is not None and (domain_blocklist or domain_cap):
        from ..functions.urls import url_domain

        docs = docs.withColumn("_domain", url_domain(url_col))
        if domain_blocklist:
            import pandas as pd

            # pandas/Arrow local relation (tuple form = Python-RDD round
            # trip per broadcast evaluation — round 10)
            bl = spark.createDataFrame(
                pd.DataFrame({"_domain": list(domain_blocklist)}),
                "_domain string",
            )
            docs = docs.join(F.broadcast(bl), "_domain", "left_anti")
        if domain_cap:
            from pyspark.sql import Window

            w = Window.partitionBy("_domain").orderBy(id_col)
            docs = (
                docs.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= domain_cap)
                .drop("_rn")
            )
        docs = docs.drop("_domain").localCheckpoint()
        report["after_domain_gate"] = docs.count()

    kept_ids = D.dedup_exact(docs, text_col, id_col).select(id_col)
    # checkpoint before counting (like every later stage): the count
    # would otherwise materialize the fingerprint groupBy+join once and
    # the near-dup stage would recompute it from scratch
    exact = docs.join(kept_ids, id_col).localCheckpoint()
    report["after_exact_dedup"] = exact.count()

    if keep == "best":
        reps = D.neardup_canonical(
            exact, text_col, id_col, threshold=neardup_threshold,
            method=neardup_method,
        )
        kept = reps.filter(
            F.col("doc_id") == F.col("canonical_id")
        ).select(F.col("doc_id").alias(id_col))
        neard = exact.join(kept, id_col).localCheckpoint()
    elif keep == "first":
        reps = D.neardup_clusters(
            exact, text_col, id_col,
            threshold=neardup_threshold, method=neardup_method,
        ).withColumnRenamed("doc_id", id_col)
        neard = (
            exact.join(reps, id_col)
            .filter(F.col(id_col) == F.col("rep_id"))
            .drop("rep_id")
            .localCheckpoint()  # cut the iterative-clustering lineage
        )
    else:
        raise ValueError(f"keep must be 'first' or 'best', got {keep!r}")
    report["after_neardup"] = neard.count()

    # each stage checkpoints BEFORE its count, so the expensive per-doc
    # derivations materialize exactly once and every later consumer (C4
    # explode, LM train/score, final write) reads the materialized
    # blocks instead of re-deriving the chain
    # language ID via the codegen'd explode+pivot twin
    # (functions/text.detect_language_df) instead of the per-row
    # array-lambda fold: inlined into a filter + projection the HOF fold
    # duplicates combinatorially and runs interpreted (round-10 plan
    # evidence in OPTIMIZATION_r10.md); per-row-identical predictions.
    # Quality gate first so the lang explode only sees its survivors.
    qual = neard.withColumn("quality", quality_score(text_col)).filter(
        F.col("quality") >= min_quality
    )
    gated = (
        qual.join(
            detect_language_df(qual, col=text_col, id_col=id_col).filter(
                F.col("lang_pred") != "und"
            ),
            id_col,
        )
        .select(*neard.columns, "lang_pred", "quality")
        .localCheckpoint()
    )
    report["after_quality_gate"] = gated.count()
    if c4_rules:
        from ..operators.text_quality import c4_filter_stats

        c4_ids = c4_filter_stats(gated, text_col=text_col, id_col=id_col).filter(
            F.col("would_keep") == 1
        ).select(id_col)
        gated = gated.join(c4_ids, id_col).localCheckpoint()
        report["after_c4_rules"] = gated.count()
    curated = gated.withColumn(text_col, scrub_pii(text_col)).localCheckpoint()

    # A stage may legitimately empty the corpus (e.g. the C4
    # terminal-punctuation rule on a corpus without sentence punctuation
    # removes every doc). Later MODEL-FITTING stages must skip, not
    # crash: lm_train raises on a corpus with no bigrams.
    n_remaining = report.get("after_c4_rules", report["after_quality_gate"])
    if lm_tail_drop and n_remaining == 0:
        report["after_lm_tail_drop"] = 0
    elif lm_tail_drop:
        # fit on the survivors themselves (self-perplexity: outliers vs
        # the corpus's own distribution), drop each language's tail
        # tercile via sampled cutoffs — map-side, no per-lang sort.
        # Docs with < 2 tokens are LM-unscorable and dropped here too
        # (CCNet's convention; the quality gate already removes most)
        try:
            likes, ctxs, oov = LM.lm_train(curated, text_col=text_col)
        except ValueError:
            # non-empty corpus where EVERY doc is under 2 tokens: all
            # LM-unscorable, so the tail drop removes everything
            curated = curated.limit(0)
            report["after_lm_tail_drop"] = 0
        else:
            scored = LM.lm_score(
                curated, likes, ctxs, oov,
                text_col=text_col, id_col=id_col, extra_cols=["lang_pred"],
            ).localCheckpoint()
            cuts = LM.bucket_thresholds(scored, lang_col="lang_pred")
            cond = None
            for lang, (_, c2) in cuts.items():
                this = (F.col("lang_pred") == lang) & (
                    F.col("avg_nll_unats") <= c2
                )
                cond = this if cond is None else (cond | this)
            if cond is not None:
                lm_ids = scored.filter(cond).select(id_col)
                curated = curated.join(lm_ids, id_col)
            report["after_lm_tail_drop"] = curated.count()

    curated.write.mode("overwrite").parquet(output_path)
    report["written"] = spark.read.parquet(output_path).count()
    return report
