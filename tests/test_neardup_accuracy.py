"""Accuracy floors for the approximate near-dup family (VERDICT #9).

MinHash estimates SHINGLE-set Jaccard; ground truth here is computed
exactly from the same 3-token shingle definition on a seeded corpus of
base docs + mutated near-dups (k token replacements => J ~ (s-3k)/(s+3k)
for s shingles). Floors are deliberately placed away from the threshold:
an estimator with per-component std sqrt(J(1-J)/num_perm) ~ 0.06 cannot
be graded at the cut line.

The corpus is deterministic (seeded RNG, fixed permutations), so these
are regression floors, not flaky statistical tests.
"""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
    minhash_neardup_pairs,
    simhash_neardup_pairs,
)

THRESHOLD = 0.5
RECALL_AT = 0.7  # grade recall only on pairs comfortably above THRESHOLD
PRECISION_SLACK = 0.15


def _corpus():
    rng = random.Random(1234)
    vocab = [f"tok{i}" for i in range(500)]
    rows, truth_tokens = [], {}
    did = 0
    for _ in range(40):
        base = [rng.choice(vocab) for _ in range(60)]
        for k in (0, rng.randint(1, 3)):
            toks = list(base)
            for _ in range(k):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            rows.append((did, " ".join(toks)))
            truth_tokens[did] = toks
            did += 1
    for _ in range(40):  # unrelated background docs
        toks = [rng.choice(vocab) for _ in range(60)]
        rows.append((did, " ".join(toks)))
        truth_tokens[did] = toks
        did += 1
    return rows, truth_tokens


def _exact_shingle_jaccard(truth_tokens, n=3):
    sets = {
        d: {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}
        for d, t in truth_tokens.items()
    }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = inter / len(sets[a] | sets[b])
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows, truth_tokens = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, _exact_shingle_jaccard(truth_tokens)


def test_minhash_recall_floor(spark, corpus):
    df, truth = corpus
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_neardup_pairs(df, threshold=THRESHOLD).collect()
    }
    strong = {p for p, j in truth.items() if j >= RECALL_AT}
    assert strong, "corpus must contain strong near-dup pairs"
    recall = len(got & strong) / len(strong)
    assert recall >= 0.9, (recall, len(strong))


def test_minhash_precision_floor(spark, corpus):
    df, truth = corpus
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_neardup_pairs(df, threshold=THRESHOLD).collect()
    }
    assert got, "estimator returned nothing"
    ok = sum(truth.get(p, 0.0) >= THRESHOLD - PRECISION_SLACK for p in got)
    assert ok / len(got) >= 0.9, (ok, len(got))


def test_simhash_recall_on_strong_pairs(spark, corpus):
    """SimHash hamming<=3 targets *very* similar docs; every pair that is
    a token-level near-identical twin (shingle J >= 0.9) must be found."""
    df, truth = corpus
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in simhash_neardup_pairs(df).collect()
    }
    twins = {p for p, j in truth.items() if j >= 0.9}
    assert twins, "corpus must contain twin pairs"
    recall = len(got & twins) / len(twins)
    assert recall >= 0.8, (recall, len(twins))


def test_minhash_agrees_with_exact_jaccard_pairs(spark, corpus):
    """Cross-check the two Spark implementations directly: every exact
    TOKEN-set near-dup pair at J>=0.8 (jaccard_pairs) is also a minhash
    candidate at a lower shingle threshold — mutated twins are near-dups
    under both metrics."""
    df, _ = corpus
    exact = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in jaccard_pairs(df, threshold=0.8).collect()
    }
    mh = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in minhash_neardup_pairs(df, threshold=0.4).collect()
    }
    assert exact, "exact pass found nothing"
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact))
