"""DSIR-style data selection — importance resampling of a raw corpus
toward a target distribution (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): fit bag-of-n-gram
multinomials over the target and the raw corpus, weight every raw
document by its log likelihood ratio, and keep the top-weighted docs.
This is the modern replacement for binary quality classifiers when
composing pretraining mixtures (GPT-3-style davinci-selection, DSIR,
DoReMi all reduce to per-doc importance weights).

Exactness design (shared with operators/classify.py and operators/lm.py):
each feature's log ratio ``ln(p_f / q_f)`` is rounded ONCE, model-side,
to fixed-point BIGINT micro-nats, so document weights are INTEGER sums —
summation-order independent and value-hash oracle-checkable.

Features: lowercased whitespace unigrams plus adjacent bigrams (the
paper's hashed n-grams, unhashed by default so the model is an exact,
inspectable table). Laplace-smoothed per-corpus probabilities over the
UNION vocabulary:

    p_f = (c_target(f) + 1) / (N_target + V)
    q_f = (c_raw(f)    + 1) / (N_raw    + V)

Features absent from both corpora contribute the same constant to p and
q, hence weight ln(1)=0 — so the model table only needs the union of
observed features and scoring needs no OOV branch (coalesce to 0).

Scale shape: fitting is two corpus scans (codegen arrays_zip n-gram
explode, map-side combined counts) joined FULL OUTER on the feature to a
vocab-bounded weight table; V and the two totals are bounded driver
scalars. Scoring shuffles once on the feature join (weight table is
vocab-bounded — AQE broadcasts when it fits; pass ``n_buckets`` to hash
features into a FIXED-size space first, the paper's trick, which caps
the model at ``n_buckets`` rows regardless of corpus vocabulary) and
once on the per-doc rollup. Selection is TakeOrdered top-k with a
doc-id tiebreak — no global sort.

Hashed mode note: ``n_buckets`` uses xxhash64 bucketing (engine-side
only, like operators/dedup fingerprints — not SQL-oracle-portable), so
the oracle-checked driver query runs unhashed; hashed-vs-unhashed
selection agreement is pinned in tests/test_dsir.py.

Reference parity: no reference counterpart (extension, like NB/LM); the
reference's selection surface is WHERE-filters (SURVEY §2.2) — this is
distribution-level selection at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_token_pairs, tokens
from .lm import MICRO  # single-sourced fixed-point scale (micro-nats)


def _doc_features(
    docs: DataFrame,
    text_col: str,
    keep: list[str],
    n_buckets: int | None = None,
) -> DataFrame:
    """(``keep`` cols..., feat) — unigram and bigram features of the
    lowercased whitespace tokens; one output row per OCCURRENCE. With
    ``n_buckets``, features are xxhash64-bucketed ints (stringified so
    the schema is stable across modes)."""
    toks = tokens(F.lower(F.col(text_col)))
    uni = docs.select(*keep, F.explode(toks).alias("feat")).filter(
        F.col("feat") != ""
    )
    bi = doc_token_pairs(docs, text_col, keep).select(
        *keep, F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("feat")
    )
    feats = uni.unionByName(bi)
    if n_buckets is not None:
        feats = feats.select(
            *keep,
            F.pmod(F.xxhash64("feat"), F.lit(n_buckets))
            .cast("string")
            .alias("feat"),
        )
    return feats


def dsir_fit(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """Fit the importance model. Returns (feat, w_unats) over the union
    of observed features, ``w = round(ln(p_f / q_f) * 1e6)`` — positive
    means target-like. Unobserved features weigh exactly 0 by
    construction, so scoring coalesces misses to 0."""
    tc = (
        _doc_features(target_docs, text_col, [], n_buckets)
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    rc = (
        _doc_features(raw_docs, text_col, [], n_buckets)
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("c_r"))
    )
    # one materialization serves V, the two totals, and the weight table
    both = (
        tc.join(rc, "feat", "full_outer")
        .select(
            "feat",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
        .localCheckpoint(eager=True)
    )
    v_size, n_t, n_r = both.agg(
        F.count(F.lit(1)), F.sum("c_t"), F.sum("c_r")
    ).first()
    if not v_size:
        raise ValueError(
            "dsir_fit: neither corpus contains any features (all docs "
            "empty) — no importance model can be fit"
        )
    return both.select(
        "feat",
        F.round(
            (
                F.log(
                    (F.col("c_t") + 1).cast("double")
                    / F.lit(float(n_t + v_size))
                )
                - F.log(
                    (F.col("c_r") + 1).cast("double")
                    / F.lit(float(n_r + v_size))
                )
            )
            * MICRO
        )
        .cast("long")
        .alias("w_unats"),
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """(id, n_feats, w_unats) — integer importance weight per document:
    the sum of its feature occurrences' log ratios. Empty docs (no
    features) score 0 with n_feats 0 via the left join."""
    feats = _doc_features(docs, text_col, [id_col], n_buckets)
    per_doc = (
        feats.join(weights, "feat", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce("w_unats", F.lit(0))).alias("w_unats"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("w_unats", F.lit(0)).alias("w_unats"),
        )
    )


def dsir_select(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Fit on (target, raw), score raw, keep the top-``k`` most
    target-like docs: (id, n_feats, w_unats), ordered by weight then id
    (total order — TakeOrderedAndProject, no global sort). The paper
    resamples with Gumbel noise; the deterministic top-k variant is the
    reproducible-pipeline form (and its hash-checkable oracle)."""
    weights = dsir_fit(target_docs, raw_docs, text_col, n_buckets)
    scored = dsir_score(raw_docs, weights, text_col, id_col, n_buckets)
    return scored.orderBy(F.desc("w_unats"), F.asc(id_col)).limit(k)
