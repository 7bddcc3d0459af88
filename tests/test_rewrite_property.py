"""Property tests for the text-rewrite operators: random corpora are
checked against independent pure-Python reference implementations of the
same semantics (corpus-wide first-occurrence by (doc, position) order).
Catches edge cases example tests miss — empty docs, whitespace-only
lines, case-folding collisions, duplicate partial grains."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from reddit_etl_pipeline_spark.operators.dedup import (
    dedup_lines,
    remove_duplicate_spans,
)

# small alphabet forces collisions; newlines/spaces exercise structure
_WORD = st.sampled_from(["aa", "bb", "cc", "Aa", "BB", ""])
_LINE = st.lists(_WORD, min_size=0, max_size=4).map(" ".join)
_DOC = st.lists(_LINE, min_size=0, max_size=5).map("\n".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)


import pytest

def _spark_tokens(text):
    r"""Mirror functions/text.tokens() exactly: SQL TRIM strips SPACES
    only, then Java \s+ split — a leading newline/tab therefore yields
    an empty first token (the oracle agrees; the reference must too)."""
    import re

    t = text.strip(" ")
    return [] if t == "" else re.split(r"[ \t\n\x0b\f\r]+", t)


def _ref_dedup_lines(texts):
    seen = set()
    out = {}
    for i, text in enumerate(texts):
        lines = text.split("\n")
        kept, removed = [], 0
        for line in lines:
            norm = line.strip(" ").lower()
            if norm == "":
                kept.append(line)
            elif norm not in seen:
                seen.add(norm)
                kept.append(line)
            else:
                removed += 1
        out[i] = ("\n".join(kept), len(lines), removed)
    return out


def _ref_remove_spans(texts, k):
    seen = set()
    out = {}
    for i, text in enumerate(texts):
        toks = _spark_tokens(text)
        kept, removed = [], 0
        for g in range((len(toks) + k - 1) // k):
            grain = toks[g * k : (g + 1) * k]
            g_str = " ".join(grain)
            if len(grain) < k:
                kept.append(g_str)
            elif g_str not in seen:
                seen.add(g_str)
                kept.append(g_str)
            else:
                removed += len(grain)
        out[i] = (" ".join(kept), len(toks), removed)
    return out


@settings(max_examples=20, deadline=None)
@given(_CORPUS)
@pytest.mark.slow
def test_dedup_lines_matches_reference(spark, corpus):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_removed"])
        for r in dedup_lines(docs).collect()
    }
    assert got == _ref_dedup_lines(corpus)


@settings(max_examples=20, deadline=None)
@given(_CORPUS, st.integers(min_value=1, max_value=3))
@pytest.mark.slow
def test_remove_duplicate_spans_matches_reference(spark, corpus, k):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_spans(docs, k=k).collect()
    }
    assert got == _ref_remove_spans(corpus, k)


def _ref_remove_spans_v2(texts, k):
    """Sequential-scan reference of the OVERLAPPING-window semantics:
    every k-window (stride 1) whose token string was seen at an earlier
    (doc, pos) marks its k tokens removed; kept tokens rejoin with ' '."""
    seen = set()
    out = {}
    for i, text in enumerate(texts):
        toks = _spark_tokens(text)
        removed = [False] * len(toks)
        for s in range(len(toks) - k + 1):
            w = " ".join(toks[s : s + k])
            if w in seen:
                for j in range(s, s + k):
                    removed[j] = True
            else:
                seen.add(w)
        kept = [t for t, r in zip(toks, removed) if not r]
        out[i] = (" ".join(kept), len(toks), sum(removed))
    return out


@settings(max_examples=20, deadline=None)
@given(_CORPUS, st.integers(min_value=1, max_value=3))
@pytest.mark.slow
def test_remove_duplicate_spans_v2_matches_reference(spark, corpus, k):
    from reddit_etl_pipeline_spark.operators.dedup import (
        remove_duplicate_spans_v2,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_spans_v2(docs, k=k).collect()
    }
    assert got == _ref_remove_spans_v2(corpus, k)


def test_v2_catches_boundary_straddling_repeat(spark):
    """The repeat 'p q r s t' sits at positions 3..7 of doc 1 — straddling
    v1's 5-token grain boundary (grains [0:5], [5:10]), so grain dedup
    misses it entirely; the overlapping-window v2 removes exactly those
    five tokens."""
    from reddit_etl_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
        remove_duplicate_spans_v2,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="p q r s t"),
            Row(doc_id=1, text="a b c p q r s t x y"),
        ]
    )
    v1 = {r.doc_id: r for r in remove_duplicate_spans(docs, k=5).collect()}
    v2 = {r.doc_id: r for r in remove_duplicate_spans_v2(docs, k=5).collect()}
    # v1: doc 1 grains 'a b c p q' and 'r s t x y' match nothing -> kept
    assert v1[1].n_tokens_removed == 0
    # v2: the straddling window 'p q r s t' at pos 3 is a duplicate
    assert v2[1].n_tokens_removed == 5
    assert v2[1].clean_text == "a b c x y"
    assert v2[0].n_tokens_removed == 0  # first occurrence survives
