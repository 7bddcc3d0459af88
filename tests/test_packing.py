"""Unit tests for sequence packing, stratified sampling, and TF-IDF."""

import math

import pytest
from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.functions.text import tfidf_topk
from reddit_etl_pipeline_spark.operators.packing import (
    pack_assignments,
    sequence_pack,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_assignments_boundaries(spark):
    # token counts: 3, 4, 2, 6 against budget 5 -> start offsets 0,3,7,9
    df = _docs(
        spark,
        [
            (1, "a b c", "s"),
            (2, "a b c d", "s"),
            (3, "a b", "s"),
            (4, "a b c d e f", "s"),
        ],
    )
    got = {r.doc_id: (r.n_tokens, r.seq_id) for r in pack_assignments(df, budget=5).collect()}
    assert got == {1: (3, 0), 2: (4, 0), 3: (2, 1), 4: (6, 1)}


def test_pack_groups_independent(spark):
    # each source starts its own running count at offset 0
    df = _docs(spark, [(1, "a b c d e f", "x"), (2, "a b", "y")])
    got = {r.doc_id: r.seq_id for r in pack_assignments(df, budget=4).collect()}
    assert got == {1: 0, 2: 0}


def test_sequence_pack_rollup(spark):
    df = _docs(spark, [(i, "w " * 10, "s") for i in range(1, 11)])  # 10 docs x 10 tokens
    rows = {(r.source, r.seq_id): (r.n_docs, r.seq_tokens) for r in sequence_pack(df, budget=25).collect()}
    # offsets 0,10,20,...,90 -> seq floor(offset/25): 0,0,0,1,1,2,2,2,3,3
    assert rows == {("s", 0): (3, 30), ("s", 1): (2, 20), ("s", 2): (3, 30), ("s", 3): (2, 20)}


def test_stratified_sample_exact_counts_and_determinism(spark, documents):
    s1 = stratified_sample(documents, k=5, stratum_col="lang")
    s2 = stratified_sample(documents, k=5, stratum_col="lang")
    per = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {
        r.lang: r.n
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per.items():
        assert n == min(5, strata[lang])
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in s2.collect())
    assert ids1 == ids2
    # the scramble actually permutes: the sample isn't just the lowest ids
    lowest = sorted(
        r.doc_id
        for lang in strata
        for r in documents.filter(f"lang = '{lang}'").orderBy("doc_id").limit(5).collect()
    )
    assert ids1 != lowest


def test_tfidf_ranks_rare_tokens_first(spark):
    df = _docs(
        spark,
        [
            (1, "common rare rare", "s"),
            (2, "common filler", "s"),
            (3, "common other", "s"),
        ],
    )
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.keyword, r.score))
    top1 = sorted(by_doc[1])[0]
    assert top1[1] == "rare"
    # tf=2, df=1, N=3 -> 2*ln(4/2)
    assert top1[2] == pytest.approx(round(2 * math.log(2.0), 6))
    # 'common' appears in all docs -> idf = ln(4/4) = 0
    for ranks in by_doc.values():
        for _, kw, score in ranks:
            if kw == "common":
                assert score == 0.0


def test_temperature_mix_rates_and_selection(spark):
    from reddit_etl_pipeline_spark.operators.packing import temperature_mix

    # sources with 10x count imbalance
    rows = [(i, "w " * 5, "big") for i in range(100)] + [
        (1000 + i, "w " * 5, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in temperature_mix(df, alpha=0.75).collect()}
    # smallest source keeps everything
    assert out["small"].keep_rate == 1.0
    assert out["small"].n_kept == 10
    # bigger source downsampled toward (n/n_min)^(alpha-1) = 10^-0.25
    expected = round(10.0 ** -0.25, 6)
    assert out["big"].keep_rate == pytest.approx(expected)
    assert 0 < out["big"].n_kept < 100
    # deterministic under repartitioning
    out2 = {
        r.source: r.n_kept
        for r in temperature_mix(df.repartition(7), alpha=0.75).collect()
    }
    assert out2 == {s: r.n_kept for s, r in out.items()}


def test_temperature_mix_alpha_one_keeps_everything(spark):
    from reddit_etl_pipeline_spark.operators.packing import temperature_mix

    rows = [(i, "x y z", "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in temperature_mix(df, alpha=1.0).collect()}
    # alpha=1 -> no flattening -> every source keeps rate 1.0
    for r in out.values():
        assert r.keep_rate == 1.0
        assert r.n_kept == r.n_docs


def test_chunk_manifest_covers_every_token_with_exact_overlap(spark):
    from reddit_etl_pipeline_spark.operators.packing import chunk_manifest

    # doc lengths spanning: empty, shorter than one chunk, exact
    # multiples, and off-by-one around the 224-token stride
    rows = [
        (i, "t " * n, "s")
        for i, n in enumerate([0, 1, 200, 224, 256, 257, 448, 1000])
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {}
    for r in chunk_manifest(df, chunk=256, overlap=32).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.start_tok, r.end_tok))
    lengths = dict(enumerate([0, 1, 200, 224, 256, 257, 448, 1000]))
    assert 0 not in out  # empty doc -> zero chunks
    for did, chunks in out.items():
        n = lengths[did]
        chunks.sort()
        # chunk ids consecutive from 0; starts at stride 224
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert all(c[1] == i * 224 for i, c in enumerate(chunks))
        # full coverage of [0, n): consecutive chunks overlap by 32
        assert chunks[0][1] == 0 and chunks[-1][2] == n
        for (_, s1, e1), (_, s2, e2) in zip(chunks, chunks[1:]):
            assert s2 < e1 and e1 - s2 == 32
        # every chunk bounded by the budget
        assert all(c[2] - c[1] <= 256 for c in chunks)


def test_train_val_test_split_deterministic_and_stable(spark, documents):
    from pyspark.sql import functions as F
    from reddit_etl_pipeline_spark.operators.packing import train_val_test_split

    docs = documents.limit(400)
    a = {r["doc_id"]: r["split"]
         for r in train_val_test_split(docs).select("doc_id", "split").collect()}
    # partition invariance
    b = {r["doc_id"]: r["split"]
         for r in train_val_test_split(docs.repartition(7))
         .select("doc_id", "split").collect()}
    assert a == b
    # stability under corpus growth: assignments of existing docs never
    # change when more docs arrive (pure function of the id)
    c = {r["doc_id"]: r["split"]
         for r in train_val_test_split(documents.limit(500))
         .select("doc_id", "split").collect()}
    assert all(c[k] == v for k, v in a.items())
    # rough band proportions (scramble uniformity)
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert 0.80 <= frac_train <= 0.97


def test_token_budget_sample_properties(spark):
    from reddit_etl_pipeline_spark.operators.packing import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "w " * (10 + i % 7)) for i in range(60)]
        + [(100, "fr", None)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_sample(docs, budget_tokens=50, group_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        total = sum(r.n_tokens for r in rows)
        # budget is a floor: total >= budget unless the group ran dry,
        # and removing the LAST selected doc (scramble order) drops
        # under budget (no over-selection)
        if lang == "fr":
            assert total == 0  # null text -> 0 tokens, still selectable
            continue
        assert total >= 50
        order = sorted(rows, key=lambda r: (r.doc_id * 2654435761 % 2**32, r.doc_id))
        assert total - order[-1].n_tokens < 50
    # determinism
    again = token_budget_sample(docs, budget_tokens=50, group_col="lang").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_scramble_is_overflow_safe_for_large_ids(spark):
    """(id * 2654435761) mod 2^32 must be computable for ANY BIGINT id:
    the naive product overflows past id ~3.5e9 (ANSI throw / silent
    wrap + DuckDB error — round-5 review). The split-multiply form must
    equal exact Python arithmetic up to 2^62, under ANSI mode."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators.packing import scramble

    ids = [0, 1, 65535, 65536, 2**31, 2**32 - 1, 2**32 + 7, 10**12, 10**18, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = {
            r["doc_id"]: r["s"]
            for r in df.select("doc_id", scramble("doc_id").alias("s")).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert got == {i: (i * 2654435761) % (1 << 32) for i in ids}


# ------------------------------------------------------------ weighted_sample


def _ws(spark, weights, k, seed=1):
    from reddit_etl_pipeline_spark.operators.packing import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    return {
        r["doc_id"]: r["n_hits"]
        for r in weighted_sample(
            df, k=k, weight_col="w", id_col="doc_id", seed=seed
        ).collect()
    }


def test_weighted_sample_exactly_k_hits(spark):
    """Σ n_hits == k exactly, whatever the weights (the systematic-PPS
    invariant), and every selected weight is positive."""
    hits = _ws(spark, [5, 0, 17, 3, 9, 1, 40, 0, 8, 2] * 30, k=37)
    assert sum(hits.values()) == 37
    assert all(h >= 1 for h in hits.values())


def test_weighted_sample_zero_weight_never_selected(spark):
    weights = [0, 100, 0, 100, 0, 100, 0, 100]
    hits = _ws(spark, weights, k=4)
    assert all(weights[d] > 0 for d in hits)
    assert sum(hits.values()) == 4


def test_weighted_sample_heavy_item_certainty(spark):
    """A row with w > W/k must be included (its interval spans at least
    one full step), with multiplicity ~ w/(W/k)."""
    weights = [1] * 100 + [900]  # W = 1000, k = 10 -> step = 100
    hits = _ws(spark, weights, k=10)
    assert 100 in hits  # the heavy row (doc_id 100)
    assert 8 <= hits[100] <= 10  # 900/100 = 9 ± edge effects


@pytest.mark.slow
def test_weighted_sample_proportionality(spark):
    """Across many seeds, empirical inclusion frequency tracks k·w/W.
    Weights 1:4 should select the heavy stratum ~4x as often."""
    import collections

    weights = ([1] * 200) + ([4] * 200)  # W = 1000
    totals = collections.Counter()
    for seed in range(1, 31):
        for d, h in _ws(spark, weights, k=10, seed=seed).items():
            totals[d >= 200] += h
    heavy, light = totals[True], totals[False]
    # expectation: heavy = 10*800/1000 = 8/round, light = 2/round
    assert 0.72 <= heavy / (heavy + light) <= 0.88, (heavy, light)


def test_weighted_sample_degenerate_small_total(spark):
    """W < k -> step = 0: defined behavior is an EMPTY result (never a
    divide-by-zero), mirrored in the oracle's WHERE step > 0."""
    assert _ws(spark, [1, 1, 1], k=10) == {}


def test_weighted_sample_matches_oracle_on_synthetic(spark):
    """Engine vs DuckDB replay on a synthetic weight table (weights and
    ids chosen to exercise bucket boundaries and ties)."""
    import duckdb

    from reddit_etl_pipeline_spark.operators.packing import (
        weighted_sample,
        weighted_sample_oracle_sql,
    )

    rows = [(i * 7919 + 3, (i * i) % 97 + (1 if i % 5 else 0)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        map(
            tuple,
            weighted_sample(df, k=50, weight_col="w", id_col="doc_id").collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.execute(weighted_sample_oracle_sql("t", "w", k=50)).fetchall())
    )
    assert got == want and sum(r[2] for r in got) == 50


def test_weighted_sample_grouped_exactly_k_per_stratum(spark):
    """group_col: each stratum runs its own threshold axis — exactly k
    hits per stratum (where stratum weight >= k), zero cross-stratum
    leakage."""
    from reddit_etl_pipeline_spark.operators.packing import weighted_sample

    rows = [(i, ["en", "fr", "de"][i % 3], (i * i) % 50 + 1) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_sample(
        df, k=25, weight_col="w", group_col="lang"
    ).collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + r.n_hits
        assert ["en", "fr", "de"][r.doc_id % 3] == r.lang  # no leakage
    assert per == {"en": 25, "fr": 25, "de": 25}


def test_leakage_safe_split_no_pair_straddles(spark, documents):
    """The defining invariant: no near-dup pair (at the split's
    threshold) may land in two different splits — and every member
    carries exactly its cluster representative's band split."""
    from reddit_etl_pipeline_spark.operators import dedup as D
    from reddit_etl_pipeline_spark.operators.packing import (
        leakage_safe_split,
        train_val_test_split,
    )

    out = leakage_safe_split(documents).collect()
    split_of = {r.doc_id: r.split for r in out}
    rep_of = {r.doc_id: r.rep_id for r in out}
    pairs = D.minhash_neardup_pairs(documents, threshold=0.7).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert split_of[p.doc_a] == split_of[p.doc_b]
        assert rep_of[p.doc_a] == rep_of[p.doc_b]
    # rep-keyed banding: members inherit the REP's per-doc split
    naive = {
        r.doc_id: r.split
        for r in train_val_test_split(
            documents.select("doc_id")
        ).collect()
    }
    for doc, rep in rep_of.items():
        assert split_of[doc] == naive[rep]
    # singletons degrade to the per-doc rule
    singles = [d for d, rep in rep_of.items() if rep == d]
    assert singles and all(split_of[d] == naive[d] for d in singles)


def test_leakage_safe_split_diverges_from_naive_when_cluster_straddles(spark):
    """A synthetic near-dup pair whose two ids band into different
    naive splits must collapse onto the rep's split (the operator is
    not a no-op)."""
    from reddit_etl_pipeline_spark.operators.packing import (
        _KNUTH,
        _MOD,
        leakage_safe_split,
    )

    def band(i):
        return (i * _KNUTH) % _MOD % 100

    # find two ids in different naive bands (test vs train)
    lo = next(i for i in range(1, 500) if band(i) < 5)
    hi = next(i for i in range(1, 500) if band(i) >= 10 and i != lo)
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(lo, text), (hi, text), (400, "completely unrelated content here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.rep_id, r.split) for r in leakage_safe_split(df).collect()}
    rep = min(lo, hi)
    assert out[lo] == (rep, out[hi][1]) and out[hi][0] == rep
    assert out[lo][1] == ("test" if band(rep) < 5 else
                          "val" if band(rep) < 10 else "train")
