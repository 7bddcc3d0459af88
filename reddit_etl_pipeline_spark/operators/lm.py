"""Bigram language-model perplexity scoring — the CCNet-style quality
gate of a training-data pipeline: fit a cheap n-gram LM on a reference
corpus, score every candidate document by average per-bigram negative
log-likelihood, and bucket each language's corpus into head / middle /
tail quality terciles (CCNet, Wenzek et al. 2020, does exactly this with
a KenLM 5-gram; the distributed shape is identical at order 2).

Exactness design (shared with operators/classify.py): every distinct
probability is rounded ONCE, model-side, to fixed-point BIGINT micro-nats
(``round(ln(p) * 1e6)``), so document scores are INTEGER sums and the
integer-floor average is bit-identical across engines — value-hash
oracle-checkable, where a per-occurrence DOUBLE log-sum would drift by
summation order.

Model: Laplace-smoothed bigram conditionals over the lowercased
whitespace vocabulary,

    p(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)     seen context w1
    p(w2 | w1) = 1 / V                            unseen context

with V = |distinct target words| in training. Three tables leave
training: the (w1,w2) likelihood table, the per-context smoothed floor,
and the scalar OOV floor — scoring is then pure integer lookups.

Scale shape: training is one corpus scan (codegen arrays_zip bigram
explode — no array-lambda HOFs, no per-doc window) into a map-side
combined count agg, localCheckpoint'd so context totals / vocab size /
the returned model derive without rescans. Scoring shuffles once on the
bigram join (model is vocab²-bounded; AQE broadcasts it when small) and
once on the per-doc rollup. The tercile NTILE sorts each language
partition — exact semantics for the oracle-checked rollup; at cluster
scale CCNet's own production recipe applies: compute cutoffs from a
held-out sample (``bucket_thresholds``) and bucket by comparison, which
keeps scoring embarrassingly parallel.

Reference parity: no reference counterpart (extension, like the NB
classifier); the reference's quality surface is null-fill + dbt tests
(SURVEY §2.11) — this is that gate at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_token_pairs as _doc_bigrams

MICRO = 1_000_000  # fixed-point scale: micro-nats per unit log-prob


def lm_train(
    train_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the bigram LM. Returns (likelihoods, contexts, oov_unats):

    - likelihoods: (w1, w2, l_unats) for every OBSERVED bigram —
      ``round(ln((c12 + 1)/(c1 + V)) * 1e6)``
    - contexts: (w1, floor_unats) — the smoothed unseen-bigram floor
      ``round(ln(1/(c1 + V)) * 1e6)`` per seen context
    - oov_unats: scalar ``round(ln(1/V) * 1e6)`` for unseen contexts

    One data-proportional scan; V is a bounded model-side driver scalar.
    """
    bg = _doc_bigrams(train_docs, text_col, keep=[])
    counts = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    v_size = counts.select("w2").distinct().count()
    if v_size == 0:
        raise ValueError(
            "lm_train: training corpus has no bigrams (every doc under "
            "2 tokens) — no model can be fit"
        )
    ctx = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    likelihoods = counts.join(ctx, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log(
                (F.col("c12") + 1).cast("double")
                / (F.col("c1") + F.lit(v_size)).cast("double")
            )
            * MICRO
        )
        .cast("long")
        .alias("l_unats"),
    )
    contexts = ctx.select(
        "w1",
        F.round(
            F.log(1.0 / (F.col("c1") + F.lit(v_size)).cast("double")) * MICRO
        )
        .cast("long")
        .alias("floor_unats"),
    )
    import math

    oov_unats = round(math.log(1.0 / v_size) * MICRO)
    return likelihoods, contexts, oov_unats


def lm_score(
    docs: DataFrame,
    likelihoods: DataFrame,
    contexts: DataFrame,
    oov_unats: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, ``extra_cols``..., n_bigrams, avg_nll_unats) — integer-floor
    average negative log-likelihood per document in micro-nats (lower =
    more reference-like). Docs with < 2 tokens are unscorable and
    excluded (CCNet drops them before the LM too). Pure integer
    arithmetic after the model joins."""
    extra = list(extra_cols or [])
    bg = _doc_bigrams(docs, text_col, keep=[id_col, *extra])
    nll = -F.coalesce(
        F.col("l_unats"), F.col("floor_unats"), F.lit(oov_unats)
    )
    return (
        bg.join(likelihoods, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .select(id_col, *extra, nll.alias("nll_unats"))
        .groupBy(id_col, *extra)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_unats").alias("sum_nll"),
        )
        .select(
            id_col,
            *extra,
            "n_bigrams",
            F.expr("sum_nll DIV n_bigrams").alias("avg_nll_unats"),
        )
    )


def perplexity_buckets(
    train_docs: DataFrame,
    test_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Train on ``train_docs``, score ``test_docs``, and roll up each
    language's scored corpus into CCNet head/middle/tail perplexity
    terciles: (lang, bucket, n_docs, min_avg_nll, max_avg_nll) — the
    per-ingest monitoring table a curation pipeline watches.

    NTILE(3) per language with (score, id) total order — exact tercile
    semantics for the oracle. Production note: at corpus scale the
    cutoffs come from a sample (``bucket_thresholds``) so bucketing
    stays map-side; the rollup here is the exactness reference."""
    likes, ctxs, oov = lm_train(train_docs, text_col=text_col)
    scored = lm_score(
        test_docs, likes, ctxs, oov,
        text_col=text_col, id_col=id_col, extra_cols=[lang_col],
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.asc("avg_nll_unats"), F.asc(id_col)
    )
    bucket = (
        F.when(F.col("tercile") == 1, F.lit("head"))
        .when(F.col("tercile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.withColumn("tercile", F.ntile(3).over(w))
        .groupBy(F.col(lang_col).alias("lang"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_nll_unats").alias("min_avg_nll"),
            F.max("avg_nll_unats").alias("max_avg_nll"),
        )
    )


def bucket_thresholds(
    scored: DataFrame,
    lang_col: str = "lang",
    quantiles: tuple[float, ...] = (1 / 3, 2 / 3),
    rel_err: float = 0.001,
) -> dict[str, list[float]]:
    """Per-language approximate quantile cutoffs of ``avg_nll_unats`` —
    the production bucketing path: broadcast these few scalars and bucket
    with plain comparisons (map-side, no per-language sort). Greenwald-
    Khanna sketch, error bounded by ``rel_err`` of the rank."""
    langs = [r[0] for r in scored.select(lang_col).distinct().collect()]
    out: dict[str, list[float]] = {}
    for lang in sorted(langs):
        out[lang] = scored.filter(F.col(lang_col) == lang).approxQuantile(
            "avg_nll_unats", list(quantiles), rel_err
        )
    return out
