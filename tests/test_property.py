"""Property-based tests (hypothesis): invariants the engine must hold for
ANY input, not just fixtures."""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators.upsert import (  # noqa: E402
    upsert_anti_join,
    upsert_latest_wins,
    upsert_window_dedup,
)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row = st.tuples(
    st.integers(min_value=0, max_value=9),  # id (collisions likely)
    st.integers(min_value=0, max_value=1000),  # score
    st.integers(min_value=0, max_value=10**6),  # ts offset seconds
)


import pytest

@given(batches=st.lists(st.lists(row, max_size=8), min_size=1, max_size=4))
@SLOW
@pytest.mark.slow
def test_upsert_anti_join_last_batch_wins(spark, batches):
    """Replaying batches in order: for every id, the surviving row comes
    from the LAST batch containing that id."""
    from pyspark.sql import Row

    schema = "id long, score long, extraction_timestamp timestamp"
    main = spark.createDataFrame([], schema)
    expect: dict[int, int] = {}
    for b in batches:
        dedup = {i: (i, s, t) for i, s, t in b}  # one row per id per batch
        rows = [
            Row(id=i, score=s, extraction_timestamp=None)
            for i, s, t in dedup.values()
        ]
        if rows:
            batch_df = spark.createDataFrame(rows, schema)
            main = upsert_anti_join(main, batch_df, key="id")
            expect.update({i: s for i, s, _ in dedup.values()})
    got = {r.id: r.score for r in main.collect()}
    assert got == expect


@given(rows=st.lists(row, min_size=0, max_size=30))
@SLOW
@pytest.mark.slow
def test_latest_wins_equals_window_dedup(spark, rows):
    """The aggregate (max_by) and window (row_number) upsert formulations
    agree whenever (id, ts) is unambiguous (distinct ts per id)."""
    from pyspark.sql import Row

    seen = set()
    uniq = []
    for i, s, t in rows:
        if (i, t) not in seen:
            seen.add((i, t))
            uniq.append((i, s, t))
    schema = "id long, score long, ts long"
    df = spark.createDataFrame([Row(id=i, score=s, ts=t) for i, s, t in uniq], schema)
    agg = {
        (r.id, r.score, r.ts)
        for r in upsert_latest_wins(df, key="id", order_col="ts").collect()
    }
    win = {
        (r.id, r.score, r.ts)
        for r in upsert_window_dedup(df, key="id", order_col="ts").collect()
    }
    assert agg == win


@given(texts=st.lists(st.text(max_size=40), min_size=0, max_size=12))
@SLOW
@pytest.mark.slow
def test_exact_dedup_partitions_rows(spark, texts):
    """dedup_exact: group sizes sum to the row count, and every kept id is
    the minimum of its duplicate group."""
    from reddit_etl_pipeline_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup_exact(df).collect()
    assert sum(r.n_copies for r in out) == len(texts)
    kept = {r.doc_id for r in out}
    assert kept <= set(range(len(texts)))


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=0,
        max_size=10,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 0.9]),
)
@SLOW
@pytest.mark.slow
def test_jaccard_pairs_matches_bruteforce(spark, docs, threshold):
    """The prefix-filtered set-similarity join must return EXACTLY the
    pairs a brute-force token-set Jaccard finds — the prefix/positional/
    length filters may never drop a qualifying pair."""
    from reddit_etl_pipeline_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, threshold=threshold).collect()
    }
    sets = {
        i: set(w for w in t.strip().lower().split() if w)
        for i, t in enumerate(docs)
    }
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                jac = round(inter / len(sets[a] | sets[b]), 6)
                if jac >= threshold:
                    want[(a, b)] = jac
    assert got == want


def test_jaccard_exact_threshold_pair_survives_float_bounds(spark):
    """Regression: sa+sb=133 makes float ceil((t/(1+t))*133) overshoot to
    64 (exact 63) at t=0.9; the bounds must be epsilon-loosened so the
    exactly-0.9 pair (63 shared, sizes 64/69) is kept."""
    from reddit_etl_pipeline_spark.operators.dedup import jaccard_pairs

    shared = [f"s{i:03d}" for i in range(63)]
    doc_a = " ".join(["uniqueA"] + shared)          # 64 tokens
    doc_b = " ".join([f"ub{i}" for i in range(6)] + shared)  # 69 tokens
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    rows = jaccard_pairs(df, threshold=0.9).collect()
    assert len(rows) == 1 and rows[0].jaccard == 0.9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    rts=st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True),
)
@pytest.mark.slow
def test_asof_forward_is_time_reversed_backward(spark, lts, rts):
    """Duality: forward as-of on t equals backward as-of on -t. Pins the
    mirrored window frame/tie order against the canonical backward
    implementation for arbitrary timestamp sets (incl. exact ties)."""
    import datetime as dt

    from reddit_etl_pipeline_spark.operators.asof import asof_join

    base = dt.datetime(2025, 1, 1)
    t = lambda x: base + dt.timedelta(hours=x)  # noqa: E731
    left = spark.createDataFrame(
        [(i, "k", t(x)) for i, x in enumerate(lts)],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", t(x), float(x)) for x in rts],
        "k string, ts timestamp, value double",
    )
    fwd = {
        r.lid: r.asof_value
        for r in asof_join(
            left, right, by="k", left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    # mirror time: negate hours around the base
    left_m = spark.createDataFrame(
        [(i, "k", t(-x)) for i, x in enumerate(lts)],
        "lid long, k string, ts timestamp",
    )
    right_m = spark.createDataFrame(
        [("k", t(-x), float(x)) for x in rts],
        "k string, ts timestamp, value double",
    )
    bwd = {
        r.lid: r.asof_value
        for r in asof_join(
            left_m, right_m, by="k", left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="backward",
        ).collect()
    }
    assert fwd == bwd
