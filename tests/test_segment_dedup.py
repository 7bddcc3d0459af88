"""Segment-level dedup (line / duplicate-span), n-gram frequency, and
shard manifest — fixtures exercise the multi-line and shared-passage
shapes the single-line synthetic corpus doesn't reach."""

from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators.dedup import (
    doc_lines,
    duplicate_span_stats,
    line_dedup_stats,
)
from reddit_etl_pipeline_spark.operators.packing import (
    shard_assignments,
    shard_manifest,
)
from reddit_etl_pipeline_spark.operators.text_quality import ngram_frequency


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_lines_normalizes_and_drops_empty(spark):
    df = _docs(spark, [(1, "Hello World\n\n  SECOND line  \n"), (2, "")])
    got = [(r.doc_id, r.seg) for r in doc_lines(df).collect()]
    assert sorted(got) == [(1, "hello world"), (1, "second line")]


def test_line_dedup_flags_shared_lines_only(spark):
    boiler = "Subscribe to our newsletter"
    df = _docs(
        spark,
        [
            (1, f"unique opening\n{boiler}\nunique closing"),
            (2, f"{boiler}\ntotally different body"),
            (3, "no shared lines here\nat all"),
            (4, ""),  # empty doc keeps a zero row
        ],
    )
    out = {r.doc_id: r for r in line_dedup_stats(df).collect()}
    assert len(out) == 4
    assert (out[1].n_lines, out[1].n_dup_lines) == (3, 1)
    assert (out[2].n_lines, out[2].n_dup_lines) == (2, 1)
    assert out[2].dup_line_frac == 0.5
    assert (out[3].n_lines, out[3].n_dup_lines) == (2, 0)
    assert (out[4].n_lines, out[4].n_dup_lines, out[4].dup_line_frac) == (0, 0, 0.0)


def test_line_dedup_counts_instances_not_distinct_lines(spark):
    # a line repeated within one doc counts each instance once it is
    # shared with another doc
    df = _docs(spark, [(1, "same\nsame\nother"), (2, "same")])
    out = {r.doc_id: r for r in line_dedup_stats(df).collect()}
    assert (out[1].n_lines, out[1].n_dup_lines) == (3, 2)
    assert (out[2].n_lines, out[2].n_dup_lines) == (1, 1)


def test_duplicate_span_stats_shared_passage(spark):
    passage = "the five token shared span"
    df = _docs(
        spark,
        [
            (1, f"alpha {passage} omega"),
            (2, f"{passage} entirely different tail words"),
            (3, "short"),  # < k tokens: zero spans, zero row kept
        ],
    )
    out = {r.doc_id: r for r in duplicate_span_stats(df, k=5).collect()}
    # doc1: 7 tokens -> 3 spans, exactly 1 equals the shared passage
    assert (out[1].n_spans, out[1].n_dup_spans) == (3, 1)
    assert (out[2].n_spans, out[2].n_dup_spans) == (5, 1)
    assert (out[3].n_spans, out[3].n_dup_spans, out[3].dup_span_frac) == (0, 0, 0.0)


def test_ngram_frequency_orders_and_counts(spark):
    df = _docs(spark, [(1, "a b a b c"), (2, "a b x"), (3, "z z")])
    out = ngram_frequency(df, n=2, top_k=3).collect()
    assert [(r.gram, r.n_occurrences, r.n_docs) for r in out] == [
        ("a b", 3, 2),  # twice in doc1, once in doc2
        ("b a", 1, 1),
        ("b c", 1, 1),
    ]


def test_shard_assignment_deterministic_and_complete(spark):
    df = _docs(spark, [(i, f"doc {i} text body") for i in range(200)])
    a1 = {r.doc_id: r.shard_id for r in shard_assignments(df, 16).collect()}
    a2 = {
        r.doc_id: r.shard_id
        for r in shard_assignments(df.repartition(7), 16).collect()
    }
    assert a1 == a2  # partitioning-independent
    assert set(a1.values()) <= set(range(16))

    man = shard_manifest(df, n_shards=16).collect()
    assert sum(r.n_docs for r in man) == 200
    assert all(r.n_tokens > 0 for r in man)
    # scramble spreads docs: no shard grabs more than half the corpus
    assert max(r.n_docs for r in man) < 100


def test_dedup_lines_rewrite(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame([
        Row(doc_id=1, text="Header\nbody one\n\nbody two"),
        Row(doc_id=2, text="header\nbody two\nunique line"),
    ])
    rows = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # doc 1 arrives first: keeps everything (blank line preserved)
    assert rows[1]["clean_text"] == "Header\nbody one\n\nbody two"
    assert rows[1]["n_lines_removed"] == 0
    # doc 2: 'header' (case-insensitive dup) and 'body two' removed
    assert rows[2]["clean_text"] == "unique line"
    assert rows[2]["n_lines"] == 3 and rows[2]["n_lines_removed"] == 2


def test_dedup_lines_all_removed_and_empty(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame([
        Row(doc_id=1, text="same"),
        Row(doc_id=2, text="same"),
        Row(doc_id=3, text=""),
    ])
    rows = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert rows[2]["clean_text"] == "" and rows[2]["n_lines_removed"] == 1
    assert rows[3]["clean_text"] == "" and rows[3]["n_lines_removed"] == 0


def test_remove_duplicate_spans_rewrite(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.operators.dedup import remove_duplicate_spans

    # doc 1: two full grains + partial; doc 2 repeats doc 1's first grain
    d1 = "a b c d e f g h i j tail1 tail2"
    d2 = "a b c d e x y z w v"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=d1), Row(doc_id=2, text=d2),
    ])
    rows = {r["doc_id"]: r
            for r in remove_duplicate_spans(docs, k=5).collect()}
    assert rows[1]["clean_text"] == d1  # first occurrence keeps all
    assert rows[1]["n_tokens"] == 12 and rows[1]["n_tokens_removed"] == 0
    # doc 2: grain "a b c d e" removed, second grain survives
    assert rows[2]["clean_text"] == "x y z w v"
    assert rows[2]["n_tokens"] == 10 and rows[2]["n_tokens_removed"] == 5


def test_remove_duplicate_spans_partial_grain_and_empty(spark):
    from pyspark.sql import Row
    from reddit_etl_pipeline_spark.operators.dedup import remove_duplicate_spans

    # identical SHORT docs: partial grains (< k) are never dedup'd
    docs = spark.createDataFrame([
        Row(doc_id=1, text="same short"), Row(doc_id=2, text="same short"),
        Row(doc_id=3, text=""),
    ])
    rows = {r["doc_id"]: r
            for r in remove_duplicate_spans(docs, k=5).collect()}
    assert rows[1]["clean_text"] == rows[2]["clean_text"] == "same short"
    assert rows[3]["clean_text"] == "" and rows[3]["n_tokens"] == 0
