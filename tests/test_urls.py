"""URL canonicalization + domain curation (functions/urls.py): the
rule matrix pinned case by case, Spark == DuckDB on every rule (the
single-sourced SQL mirrors), and the curate_corpus domain gate
(blocklist + per-domain cap) semantics."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.functions import urls as U  # noqa: E402

# (raw, canonical, domain) — one row per canonicalization rule plus
# combinations; the matrix the round-10 domain-curation stage rests on
MATRIX = [
    # scheme + host case
    ("HTTP://EXAMPLE.COM/Path", "http://example.com/Path", "example.com"),
    # path/query case preserved
    ("https://Example.com/A?B=C", "https://example.com/A?B=C", "example.com"),
    # default ports stripped...
    ("http://example.com:80/x", "http://example.com/x", "example.com"),
    ("https://example.com:443/x", "https://example.com/x", "example.com"),
    # ...but only for the matching scheme, and non-default ports kept
    ("http://example.com:443/x", "http://example.com:443/x", "example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x", "example.com"),
    # fragments dropped
    ("http://example.com/x#frag", "http://example.com/x", "example.com"),
    # tracking params removed, order of survivors preserved
    (
        "https://example.com/p?utm_source=a&id=7&utm_campaign=b&q=z",
        "https://example.com/p?id=7&q=z",
        "example.com",
    ),
    ("http://example.com/p?gclid=1&fbclid=2", "http://example.com/p", "example.com"),
    ("http://example.com/p?ref=x&mc_cid=1&mc_eid=2", "http://example.com/p", "example.com"),
    # 'ref' is removed but 'referrer'-style params whose NAME merely
    # starts differently are kept ('ref' must match the whole name)
    ("http://example.com/p?refresh=1", "http://example.com/p?refresh=1", "example.com"),
    # empty path -> '/'
    ("https://example.com", "https://example.com/", "example.com"),
    ("https://example.com?gclid=z", "https://example.com/", "example.com"),
    # trim
    ("  http://example.com/x  ", "http://example.com/x", "example.com"),
    # www. stripped from the DOMAIN only (canonical URL keeps it)
    ("http://www.example.com/x", "http://www.example.com/x", "example.com"),
    # everything at once
    (
        " HTTPS://WWW.Example.COM:443/A/b?utm_source=s&k=1#f ",
        "https://www.example.com/A/b?k=1",
        "example.com",
    ),
]


@pytest.fixture(scope="module")
def matrix_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(MATRIX)], "i long, url string"
    )


def test_canonicalization_matrix(matrix_df):
    rows = matrix_df.select(
        "i",
        U.canonicalize_url("url").alias("c"),
        U.url_domain("url").alias("d"),
    ).collect()
    got = {r.i: (r.c, r.d) for r in rows}
    for i, (raw, want_c, want_d) in enumerate(MATRIX):
        assert got[i] == (want_c, want_d), f"case {i}: {raw!r} -> {got[i]}"


def test_sql_mirrors_match_spark(matrix_df):
    """The DuckDB replays produce the identical strings for every rule
    (the cross-engine guarantee the oracle entries rest on)."""
    con = duckdb.connect()
    got = {}
    for i, (raw, _, _) in enumerate(MATRIX):
        lit = "'" + raw.replace("'", "''") + "'"
        c, d = con.execute(
            f"SELECT {U.canonical_url_sql(lit)}, {U.url_domain_sql(lit)}"
        ).fetchone()
        got[i] = (c, d)
    for i, (raw, want_c, want_d) in enumerate(MATRIX):
        assert got[i] == (want_c, want_d), f"case {i}: {raw!r} -> {got[i]}"


def test_canonical_collapses_variants(spark):
    """Spelling variants of one resource collapse to one canonical URL
    — the dedup property domain_rollup's n_urls measures."""
    variants = [
        "http://example.com/a",
        "HTTP://EXAMPLE.COM/a",
        "http://example.com:80/a",
        "http://example.com/a#x",
        "http://example.com/a?utm_source=s",
        "  http://example.com/a  ",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    out = df.select(U.canonicalize_url("url").alias("c")).distinct().collect()
    assert [r.c for r in out] == ["http://example.com/a"]


def test_curation_domain_gate(spark, tmp_path):
    """Blocklist drops whole domains; the cap keeps the lowest-id docs
    per domain; both recorded in the funnel report."""
    from reddit_etl_pipeline_spark.plans.curation import curate_corpus

    rows = []
    for i in range(6):
        rows.append((i, f"this is the unique document number {i} and it has words " * 10, f"http://spam.example.com/{i}"))
    for i in range(6, 12):
        rows.append((i, f"this is the unique document number {i} and it has words " * 10, f"http://good.example.com/{i}"))
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(
        rows, "doc_id long, text string, url string"
    ).write.parquet(src)
    report = curate_corpus(
        spark,
        src,
        out,
        min_quality=0.0,
        url_col="url",
        domain_blocklist=["spam.example.com"],
        domain_cap=4,
    )
    kept = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # spam.* gone entirely; good.* capped to its 4 lowest ids
    assert ids == [6, 7, 8, 9]
    assert report["after_domain_gate"] == 4
    assert report["input"] == 12


def test_streamed_domain_rollup_equals_batch(spark, sf_dir):
    """Streaming ledger twin == batch rollup (additive SUM partials +
    first-writer canonical-URL ledger across micro-batches)."""
    import __spark_entry__ as E
    from reddit_etl_pipeline_spark.streaming import stream as ST

    got = sorted(
        tuple(r)
        for r in ST.streamed_domain_rollup(
            spark, sf_dir, E._URL_FIXTURE_SQL
        ).collect()
    )
    want = sorted(
        tuple(r) for r in E.queries()["domain_rollup"](spark, sf_dir).collect()
    )
    assert len(got) > 0
    assert got == want


def test_streamed_domain_rollup_slice_invariant(spark, sf_dir):
    """n_urls must not depend on how docs split into micro-batches —
    the ledger law's membership invariance on a string relation."""
    import __spark_entry__ as E
    from reddit_etl_pipeline_spark.streaming import stream as ST

    a = sorted(
        tuple(r)
        for r in ST.streamed_domain_rollup(
            spark, sf_dir, E._URL_FIXTURE_SQL, n_slices=2
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in ST.streamed_domain_rollup(
            spark, sf_dir, E._URL_FIXTURE_SQL, n_slices=4
        ).collect()
    )
    assert a == b
