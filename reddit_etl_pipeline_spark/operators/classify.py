"""Multinomial Naive Bayes document classifier — the supervised scoring
op of a training-data pipeline (fastText-style language/quality gating),
expressed as pure aggregations so train AND predict are each one
codegen'd Catalyst plan: no iteration, no UDFs, no driver-side math
beyond two bounded scalars.

Exactness design: log-probabilities are stored as fixed-point BIGINT
micro-nats (``round(ln(p) * 1e6)``), so per-document scores are INTEGER
sums — summation-order-independent and bit-identical across engines,
which makes the confusion-matrix driver query value-hash oracle-checkable
(a raw DOUBLE log-sum would differ in the last ulp by aggregation order).
Ties break to the lexicographically smallest label.

Scale shape: training is one token-explode + two groupBys (map-side
combined); the model is a (vocab x labels) likelihood table — bounded, in
production capped to the top-K vocabulary by frequency, and broadcast to
the scoring join when it fits (AQE decides). Scoring shuffles once on the
token join and once on the (doc, label) score aggregate; documents with
no in-vocabulary tokens fall back to the prior-only argmax.

Reference parity: extends the reference's per-group aggregate family
(models/marts/reddit_summary.sql) to supervised per-row scoring; no
reference counterpart (extension, like windows/streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

MICRO = 1_000_000  # fixed-point scale: micro-nats per unit log-prob


def _label_tokens(
    docs: DataFrame, label_col: str, text_col: str
) -> DataFrame:
    return (
        docs.select(
            F.col(label_col).alias("label"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Fit the model. Returns (priors, likelihoods):

    - priors: (label, prior_unats) — ``round(ln(n_docs_label/n_docs)*1e6)``
    - likelihoods: (tok, label, l_unats) over the FULL vocab x label grid
      with Laplace smoothing: ``round(ln((c_tl + 1)/(c_l + V))*1e6)`` —
      unseen (tok, label) pairs get the smoothed floor, so the scoring
      join needs no null handling.

    Two driver scalars (vocab size V, total training docs) — both bounded
    model-side quantities, not data-proportional collects."""
    toks = _label_tokens(docs, label_col, text_col)
    # materialize the (label, tok) counts once: vocab/totals/the v_size
    # driver action and the returned likelihood plan all derive from it,
    # and without the checkpoint the corpus-wide token explode would
    # re-execute for each (the single heaviest stage of training)
    counts = (
        toks.groupBy("label", "tok")
        .agg(F.count(F.lit(1)).alias("c_tl"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("label").agg(F.sum("c_tl").alias("c_l"))
    vocab = counts.select("tok").distinct()
    v_size = vocab.count()
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_total = docs.count()
    priors = doc_counts.select(
        "label",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.lit(float(n_total))) * MICRO
        ).cast("long").alias("prior_unats"),
    )
    grid = vocab.crossJoin(totals.select("label", "c_l"))
    likelihoods = (
        grid.join(counts, ["label", "tok"], "left")
        .select(
            "tok",
            "label",
            F.round(
                F.log(
                    (F.coalesce(F.col("c_tl"), F.lit(0)) + 1).cast("double")
                    / (F.col("c_l") + F.lit(v_size)).cast("double")
                )
                * MICRO
            ).cast("long").alias("l_unats"),
        )
    )
    return priors, likelihoods


def nb_scores(
    docs: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, score_unats) for EVERY doc × label — the integer NB
    score table ``nb_predict`` argmaxes and ``nb_auc`` ranks.
    Out-of-vocabulary tokens are ignored (standard multinomial NB
    inference); documents with no in-vocab tokens score on the prior
    alone."""
    doc_toks = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scores = (
        doc_toks.join(likelihoods, "tok")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("cnt") * F.col("l_unats")).alias("tok_unats"))
    )
    # every doc x every label (prior-only fallback for OOV-only docs)
    return (
        docs.select(id_col).crossJoin(priors)
        .join(scores, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (F.col("prior_unats") + F.coalesce(F.col("tok_unats"), F.lit(0))).alias(
                "score_unats"
            ),
        )
    )


def nb_predict(
    docs: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, predicted) — argmax over the integer ``nb_scores`` table.
    Ties -> smallest label."""
    all_scored = nb_scores(
        docs, priors, likelihoods, text_col=text_col, id_col=id_col
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_unats"), F.asc("label")
    )
    return (
        all_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("predicted"))
    )


def nb_auc(
    scored: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    actual_col: str = "actual",
) -> DataFrame:
    """One-vs-rest ROC AUC per label from the integer score table — the
    threshold-free classifier evaluation beside the confusion matrix.

    AUC is the Mann–Whitney rank statistic computed EXACTLY in
    integers: rank each label's scores ascending with MIDRANKS for ties
    (2·midrank = rank_lo + rank_hi, both from window functions — rank()
    gives the tie group's low rank, a count-over-(label, score) window
    its size), then

        AUC = (Σ_pos 2·midrank − P·(P+1)) / (2·P·N)

    — a BIGINT numerator and ONE correctly-rounded 6-dp divide, so the
    DuckDB replay hash-matches (a float pairwise comparison loop would
    be O(P·N) and summation-order-dependent). Ties across classes are
    handled exactly (each counts ½ win — the standard convention).
    Labels with zero positives or zero negatives are absent. Returns
    (label, n_pos, n_neg, auc)."""
    s = scored.join(
        truth.select(
            F.col(id_col), F.col(actual_col).alias("_actual")
        ),
        id_col,
    )
    wl = Window.partitionBy("label").orderBy("score_unats")
    wt = Window.partitionBy("label", "score_unats")
    ranked = s.select(
        "label",
        (F.col("_actual") == F.col("label")).alias("is_pos"),
        (
            F.rank().over(wl) * 2 + F.count(F.lit(1)).over(wt) - 1
        ).alias("two_mid"),  # = r_lo + (r_lo + cnt - 1)
    )
    agg = ranked.groupBy("label").agg(
        F.sum(F.when(F.col("is_pos"), F.col("two_mid"))).alias("s2"),
        F.count(F.when(F.col("is_pos"), F.lit(1))).alias("n_pos"),
        F.count(F.when(~F.col("is_pos"), F.lit(1))).alias("n_neg"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "label",
            "n_pos",
            "n_neg",
            F.round(
                (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1))
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
    )


def nb_confusion(
    train_docs: DataFrame,
    test_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on ``train_docs``, predict ``test_docs``, return the
    confusion matrix (actual, predicted, n_docs) — the evaluation rollup
    a corpus-filtering pipeline monitors per ingest batch."""
    priors, likes = nb_train(train_docs, label_col=label_col, text_col=text_col)
    preds = nb_predict(test_docs, priors, likes, text_col=text_col, id_col=id_col)
    return (
        test_docs.select(F.col(id_col), F.col(label_col).alias("actual"))
        .join(preds, id_col)
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
