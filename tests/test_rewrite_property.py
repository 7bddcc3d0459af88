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


def _spark_tokens(text):
    """Mirror functions/text.tokens() exactly: SQL TRIM strips SPACES
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
def test_remove_duplicate_spans_matches_reference(spark, corpus, k):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_spans(docs, k=k).collect()
    }
    assert got == _ref_remove_spans(corpus, k)
