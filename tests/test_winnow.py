"""Winnowing fingerprints (dedup.winnow_fingerprints / winnow_overlap):
the selection guarantee, determinism, and the df-cap."""

import random

import pytest

from reddit_etl_pipeline_spark.operators import dedup

pytestmark = pytest.mark.usefixtures("spark")

K, W = 5, 4


def _words(rng, n):
    return [f"w{rng.randint(0, 5000)}" for _ in range(n)]


def test_shared_passage_guarantee(spark):
    """Any passage of at least k + w - 1 tokens shared by two documents
    must contribute at least one identical fingerprint to both (the
    winnowing theorem) — regardless of the offset it appears at."""
    rng = random.Random(42)
    passage = _words(rng, K + W - 1)  # minimal guaranteed length
    docs = []
    for i in range(6):
        pre = _words(rng, rng.randint(0, 30))
        post = _words(rng, rng.randint(0, 30))
        docs.append((i, " ".join(pre + passage + post)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {
        i: {r["fp"] for r in rows}
        for i, rows in (
            (i, dedup.winnow_fingerprints(df.filter(f"doc_id = {i}")).collect())
            for i, _ in docs
        )
    }
    for i in range(6):
        for j in range(i + 1, 6):
            assert fps[i] & fps[j], (i, j)


def test_disjoint_docs_share_nothing(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(40))),
         (2, " ".join(f"b{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    rows = dedup.winnow_fingerprints(df).collect()
    a = {r["fp"] for r in rows if r["doc_id"] == 1}
    b = {r["fp"] for r in rows if r["doc_id"] == 2}
    assert a and b and not (a & b)


def test_short_doc_gets_one_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = dedup.winnow_fingerprints(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r["fp"])
    assert len(by.get(1, [])) == 1  # zero-padded single gram
    assert 2 not in by  # NULL text: no fingerprints
    assert len(by.get(3, [])) == 1  # empty string tokenizes to ['']


def test_overlap_report_orders_and_caps(spark):
    rng = random.Random(7)
    shared = _words(rng, 30)
    docs = [(i, " ".join(_words(rng, 10) + shared + _words(rng, 10)))
            for i in range(4)]
    docs += [(9, " ".join(_words(rng, 60)))]  # unrelated
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dedup.winnow_overlap(df, min_shared=1).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    for i in range(4):
        for j in range(i + 1, 4):
            assert (i, j) in pairs
    assert not any(9 in p for p in pairs)
    # totally ordered: desc shared, asc doc_a, asc doc_b
    key = [(-r["shared_fps"], r["doc_a"], r["doc_b"]) for r in rows]
    assert key == sorted(key)
    # df-cap: a fingerprint in every doc is dropped before pairing
    many = [(i, " ".join(shared)) for i in range(30)]
    df2 = spark.createDataFrame(many, "doc_id long, text string")
    assert dedup.winnow_overlap(df2, min_shared=1, max_df=5).count() == 0
