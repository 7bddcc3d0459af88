"""Sketch aggregates: approximate results must land within their
advertised error bounds of the exact answers; sorted writes must skip
data at scan time."""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.plans import star as Q  # noqa: E402
from reddit_etl_pipeline_spark.operators import sketches as SK  # noqa: E402
from reddit_etl_pipeline_spark.sources.lake import write_sorted  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(
    params=[SK.approx_distinct_stats, Q.approx_distinct_stats_native],
    ids=["hll_replayable", "hllpp_native"],
)
def sketch_rows(request, spark, sf_dir):
    return request.param(spark, sf_dir).collect()


def test_approx_distinct_within_rsd(sketch_rows, events):
    approx = {r.event_type: r.approx_users for r in sketch_rows}
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(3, 0.1 * n), (et, approx[et], n)


def test_approx_percentile_close_to_exact(sketch_rows, events):
    approx = {r.event_type: r.approx_p50 for r in sketch_rows}
    exact = {
        r.event_type: r.p50
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50"))
        .collect()
    }
    for et, p in exact.items():
        assert abs(approx[et] - p) <= 0.05 * max(abs(p), 1.0), (et, approx[et], p)


def test_hll_oracle_matches_spark(spark, sf_dir):
    """The whole point of the hand-rolled sketch: DuckDB replays it bit
    for bit (register maxes, integer harmonic sum, shared LC table)."""
    import duckdb

    got = sorted(
        tuple(r) for r in SK.approx_distinct_stats(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(con.execute(SK.hll_oracle_sql()).fetchall())
    con.close()
    assert got == want


def test_hll_register_state_bounded():
    """Sketch state per group is m registers regardless of input size —
    the table literal and geometry constants agree with the docstring."""
    assert SK.M == 1 << SK.B
    table = SK._lc_table()
    assert len(table) == SK.M
    assert table[SK.M - 1] == 0  # V=m -> ln(1)=0
    assert table[0] == round(SK.M * __import__("math").log(SK.M))
    # estimator numerator must fit the DECIMAL(33,0) cast hll_estimate
    # actually uses (a looser pin let a future B bump overflow to NULL
    # at runtime instead of failing here)
    assert SK._EST_NUM < 10**33


def test_write_sorted_clusters_values(spark, events):
    d = tempfile.mkdtemp()
    path = f"{d}/sorted"
    write_sorted(events.select("event_id", "user_id"), path, ["user_id"], n_files=4)
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) == 4
    # range partitioning: per-file user_id ranges must not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # round-trip integrity
    assert spark.read.parquet(path).count() == events.count()


def test_write_zordered_clusters_both_dims(spark):
    from reddit_etl_pipeline_spark.sources.lake import write_zordered

    import glob as _glob
    import pyarrow.parquet as pq

    # uniform 2-D grid: 64x64 points
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    d = tempfile.mkdtemp()
    path = f"{d}/zorder"
    write_zordered(df, path, "x", "y", n_files=16)
    files = sorted(_glob.glob(f"{path}/*.parquet"))
    assert len(files) > 1

    def file_span(f, col):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        return hi - lo

    # Z-order: EVERY file must cover well under the full 0..63 span on
    # BOTH dimensions (a 1-D sort leaves the second dim at full span in
    # every file). 16 files over a 64x64 grid -> ideal span ~16; allow 32.
    for f in files:
        assert file_span(f, "x") <= 32, (f, file_span(f, "x"))
        assert file_span(f, "y") <= 32, (f, file_span(f, "y"))

    # row preservation
    back = spark.read.parquet(path)
    assert back.count() == 4096
    assert back.agg(F.sum("payload")).first()[0] == sum(range(4096))


def test_cms_never_undercounts_and_bounds(spark, sf_dir):
    from reddit_etl_pipeline_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact_n  # the CMS one-sided guarantee
        assert r.overcount == r.cms_est - r.exact_n
    # sketch state is bounded by construction
    assert CMS_D * CMS_W == 4096


def test_streamed_cms_equals_batch_sketch(spark, sf_dir):
    """The streaming counter aggregate must equal a one-batch sketch of
    the same events (counter sums are linear), and the CMS one-sided
    guarantee must hold on the probe."""
    from pyspark.sql import functions as F

    from reddit_etl_pipeline_spark.operators import sketches as SK
    from reddit_etl_pipeline_spark.plans.star import load
    from reddit_etl_pipeline_spark.streaming import stream as ST

    got = {
        r.user_id: (r.exact_n, r.cms_est, r.overcount)
        for r in ST.streamed_cms_heavy_users(spark, sf_dir, top_n=10).collect()
    }
    assert len(got) == 10
    assert all(est >= n and over == est - n for n, est, over in got.values())

    # batch twin: identical hash/position exprs over one batch read
    ev = load(spark, sf_dir, "events")
    hashed = ev.select(
        F.expr("xxhash64(user_id) & 4294967295").alias("h1"),
        F.expr("shiftrightunsigned(xxhash64(user_id), 32)").alias("h2"),
    )
    idx = SK._cms_idx_exprs_spark()
    positions = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), idx[j].alias("idx"))
                    for j in range(SK.CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.idx")
    sketch = positions.groupBy("j", "idx").agg(
        F.count(F.lit(1)).alias("counter")
    )
    want = {
        r.user_id: (r.exact_n, r.cms_est, r.overcount)
        for r in SK.cms_probe_users(spark, sf_dir, sketch, top_n=10).collect()
    }
    assert got == want


def test_streamed_bloom_equals_batch(spark, sf_dir):
    """Per-micro-batch partial blooms OR into exactly the bloom of the
    union, so the streaming twin's full accounting frame must equal the
    batch one."""
    from reddit_etl_pipeline_spark.operators.sketches import (
        bloom_contamination_stats,
    )
    from reddit_etl_pipeline_spark.streaming import stream as ST

    key = lambda r: r.source  # noqa: E731
    got = {
        key(r): (r.n_docs, r.n_flagged, r.n_banned, r.n_false_pos)
        for r in ST.streamed_bloom_contamination(spark, sf_dir).collect()
    }
    want = {
        key(r): (r.n_docs, r.n_flagged, r.n_banned, r.n_false_pos)
        for r in bloom_contamination_stats(spark, sf_dir).collect()
    }
    assert got == want and got


def test_bloom_flags_superset_of_banned(spark, sf_dir):
    from reddit_etl_pipeline_spark.operators.sketches import (
        bloom_contamination_stats,
    )

    rows = bloom_contamination_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # no false negatives ever; false positives accounted exactly
        assert r.n_flagged >= r.n_banned
        assert r.n_false_pos == r.n_flagged - r.n_banned
        assert r.n_docs >= r.n_flagged


def test_cms_mixed_case_matches_oracle(spark, tmp_path):
    """Engine tokenization must lowercase BEFORE hashing (the oracle
    splits trim(lower(text))); pinned on a mixed-case corpus because the
    synthetic documents table is all-lowercase and would never catch a
    divergence here (round-7 ADVICE)."""
    import duckdb

    rows = [
        (1, "The QUICK brown FOX the quick", "en", "web", 10),
        (2, "Quick BROWN fox JUMPS over", "en", "web", 10),
        (3, "THE the The lazy DOG dog", "en", "books", 10),
        (4, "", "en", "web", 0),
        (5, None, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "mixedcase")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = sorted(
        tuple(r) for r in SK.cms_heavy_hitters(spark, d, top_n=10).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = sorted(con.execute(SK.cms_oracle_sql(top_n=10)).fetchall())
    con.close()
    assert got == want and got
    # every surviving token is lowercase on the engine side
    assert all(tok == tok.lower() for tok, *_ in got)


def test_grid_quantiles_within_resolution(spark, sf_dir, events):
    """Every grid-sketch quantile must sit within one grid cell (1e-3)
    of the ORDER STATISTIC at rank ceil(q·n) — the sketch's contract is
    grid resolution around the discrete quantile (an interpolated
    percentile can sit a whole data gap away, which is not the sketch's
    error)."""
    import math

    got = {r.event_type: r for r in SK.value_quantiles(spark, sf_dir).collect()}
    vals = {}
    for r in events.select("event_type", "value").collect():
        if r.value is not None:
            vals.setdefault(r.event_type, []).append(r.value)
    for v in vals.values():
        v.sort()
    for q, num, den in SK.QUANTS:
        for et, v in vals.items():
            rank = (len(v) * num + den - 1) // den  # ceil(n*q), 1-based
            exact = v[rank - 1]
            g = got[et][f"approx_{q}"]
            # the sketch reports floor(value·S)/S of the rank-th value's
            # bin: within one cell below, plus 6-dp rounding headroom
            assert exact - g <= 1.0 / SK.P50_SCALE + 1e-6 and g <= exact + 1e-6, (
                q, et, g, exact,
            )
            assert math.isclose(g, round(g, 6))


def test_streamed_quantile_grid_equals_batch(spark, sf_dir):
    """Per-micro-batch bin-count partials SUM into exactly the grid of
    the union, so the streaming twin must equal the batch frame row for
    row (the CMS merge-law convention)."""
    from reddit_etl_pipeline_spark.streaming import stream as ST

    got = sorted(
        tuple(r) for r in ST.streamed_value_quantiles(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in SK.value_quantiles(spark, sf_dir).collect()
    )
    assert got == want and got


def test_hll_overlap_accuracy(spark, sf_dir, events):
    """Inclusion-exclusion intersection estimates inherit ~3 sketch
    errors; bound against exact pairwise overlaps with the compounded
    tolerance, and pin union >= max(single) structural sanity."""
    got = {
        (r.type_a, r.type_b): r
        for r in SK.hll_user_overlap(spark, sf_dir).collect()
    }
    assert len(got) == 10  # C(5,2) event-type pairs
    users = {}
    for r in events.select("event_type", "user_id").distinct().collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    for (a, b), row in got.items():
        exact_u = len(users[a] | users[b])
        exact_i = len(users[a] & users[b])
        assert abs(row.approx_union - exact_u) <= max(5, 0.1 * exact_u)
        # intersection error compounds across three estimates
        tol = max(10, 0.1 * (len(users[a]) + len(users[b]) + exact_u))
        assert abs(row.approx_overlap - exact_i) <= tol, (a, b, row, exact_i)
        assert row.approx_union >= max(row.users_a, row.users_b) - max(
            3, 0.05 * row.approx_union
        )
        assert row.approx_overlap >= 0


@pytest.mark.slow
def test_tv_drift_bounds_and_known_values(spark, tmp_path):
    """TV distance properties on constructed events: identical
    populations -> 0; disjoint value supports -> 1; a half-shifted
    population -> exactly 0.5 (half the mass must move)."""
    rows = []
    # type 'same': even and odd ids draw identical values (decouple the
    # value from id parity — i % 10 would hand evens {0,2,..} and odds
    # {1,3,..}, i.e. DISJOINT supports)
    for i in range(200):
        rows.append((i, i, "same", float((i // 2) % 10), "2024-01-01 00:00:00"))
    # type 'disjoint': evens at 0..9, odds at 100..109
    for i in range(200):
        base = (i // 2) % 10
        v = float(base) if i % 2 == 0 else float(100 + base)
        rows.append((1000 + i, i, "disjoint", v, "2024-01-01 00:00:00"))
    # type 'half': evens all at 0.0; odds half at 0.0, half at 5.0
    for i in range(200):
        v = 0.0 if i % 2 == 0 else (0.0 if (i // 2) % 2 == 0 else 5.0)
        rows.append((2000 + i, i, "half", v, "2024-01-01 00:00:00"))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "drift")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")

    # type 'onesided': every event_id even -> population B empty; the
    # type must be ABSENT (not NULL-tv) from batch AND streaming twins
    for i in range(20):
        rows.append((3000 + 2 * i, i, "onesided", 1.0, "2024-01-01 00:00:00"))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "drift")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r.event_type: r.tv_distance
        for r in SK.value_drift_by_type(spark, d).collect()
    }
    assert got["same"] == 0.0
    assert got["disjoint"] == 1.0
    assert got["half"] == 0.5
    assert "onesided" not in got

    from reddit_etl_pipeline_spark.streaming import stream as ST

    got_stream = {
        r.event_type: r.tv_distance
        for r in ST.streamed_value_drift(spark, d).collect()
    }
    assert got_stream == got


def test_streamed_drift_equals_batch(spark, sf_dir):
    """The streaming two-sided grid SUMs into exactly the batch grids,
    so the streaming drift frame must equal the batch one row for row."""
    from reddit_etl_pipeline_spark.streaming import stream as ST

    got = sorted(
        tuple(r) for r in ST.streamed_value_drift(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in SK.value_drift_by_type(spark, sf_dir).collect()
    )
    assert got == want and got


# ------------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    """Fewer distinct keys than k -> the state IS the exact set; well
    above k the estimator lands within ~4 sigma of 1/sqrt(k-2)."""
    from reddit_etl_pipeline_spark.operators import sketches as SK

    small = spark.createDataFrame(
        [(i % 100, "a") for i in range(1000)], "user_id long, event_type string"
    )
    est = SK.kmv_estimate(
        SK.kmv_bottomk(small, "event_type", "xxhash64(user_id)"), "event_type"
    ).collect()[0]
    assert est.n_kept == 100 and est.kmv_est == 100

    big = spark.createDataFrame(
        [(i, "b") for i in range(20000)], "user_id long, event_type string"
    )
    est = SK.kmv_estimate(
        SK.kmv_bottomk(big, "event_type", "xxhash64(user_id)"), "event_type"
    ).collect()[0]
    assert est.n_kept == SK.KMV_K
    assert abs(est.kmv_est - 20000) <= 0.25 * 20000, est.kmv_est


def test_kmv_min_set_merge_law(spark):
    """bottom-k of a union == bottom-k of the merged per-part bottom-k
    states — the law the streaming twin and any partitioned build rely
    on; also idempotent (merging a state with itself is a no-op)."""
    from reddit_etl_pipeline_spark.operators import sketches as SK

    full = spark.createDataFrame(
        [(i * 31 + 7, "t") for i in range(3000)],
        "user_id long, event_type string",
    )
    parts = [
        full.filter(F.col("user_id") % 3 == i) for i in range(3)
    ]
    direct = sorted(
        map(
            tuple,
            SK.kmv_bottomk(full, "event_type", "xxhash64(user_id)").collect(),
        )
    )
    states = [
        SK.kmv_bottomk(p, "event_type", "xxhash64(user_id)") for p in parts
    ]
    merged_in = states[0].unionByName(states[1]).unionByName(states[2])
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("flipped")
    merged = sorted(
        map(
            tuple,
            merged_in.distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= SK.KMV_K)
            .select("event_type", "flipped")
            .collect(),
        )
    )
    assert merged == direct
    # idempotence: state ∪ state re-bottom-ks to itself
    twice = sorted(
        map(
            tuple,
            states[0]
            .unionByName(states[0])
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= SK.KMV_K)
            .select("event_type", "flipped")
            .collect(),
        )
    )
    assert twice == sorted(map(tuple, states[0].collect()))


def test_kmv_stream_equals_batch(spark, sf_dir):
    """The foreachBatch min-set merge must converge to the one-batch
    sketch exactly."""
    from reddit_etl_pipeline_spark.operators import sketches as SK
    from reddit_etl_pipeline_spark.streaming.stream import streamed_kmv_distinct

    got = sorted(map(tuple, streamed_kmv_distinct(spark, sf_dir).collect()))
    want = sorted(map(tuple, SK.kmv_distinct_users(spark, sf_dir).collect()))
    assert got == want


def test_kmv_jaccard_accuracy_known_overlap(spark, monkeypatch, tmp_path):
    """Two types with engineered |A∩B|/|A∪B| = 1/3 (A = 0..5999,
    B = 3000..8999): the bottom-k estimate lands within ~4 sigma of
    sqrt(J(1-J)/k) ≈ 0.03."""
    from reddit_etl_pipeline_spark.operators import sketches as SK

    rows = [(u, "a") for u in range(6000)] + [
        (u, "b") for u in range(3000, 9000)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    df.withColumn("event_id", F.col("user_id")).withColumn(
        "ts", F.expr("timestamp '2024-01-01 00:00:00'")
    ).withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit(None).cast("string")
    ).coalesce(2).write.parquet(str(tmp_path / "events.parquet"))
    out = SK.kmv_user_jaccard(spark, str(tmp_path)).collect()[0]
    assert out.type_a == "a" and out.type_b == "b"
    assert abs(out.jaccard_est - 1 / 3) <= 0.12, out.jaccard_est


def test_kmv_sample_users_shape_and_determinism(spark, sf_dir):
    """Exactly n exemplar users per type (distinct hashes -> distinct
    users at these cardinalities), stable across invocations, and each
    row's count equals the user's true event count for the type."""
    from reddit_etl_pipeline_spark.operators import sketches as SK
    from reddit_etl_pipeline_spark.plans.star import load

    a = sorted(map(tuple, SK.kmv_sample_users(spark, sf_dir, n=5).collect()))
    b = sorted(map(tuple, SK.kmv_sample_users(spark, sf_dir, n=5).collect()))
    assert a == b
    per_type = {}
    for t, u, n in a:
        per_type.setdefault(t, set()).add(u)
    assert all(len(us) == 5 for us in per_type.values())
    ev = load(spark, sf_dir, "events")
    truth = {
        (r.event_type, r.user_id): r.n
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(truth[(t, u)] == n for t, u, n in a)


class TestKmvValueQuantiles:
    """Sampled-rank quantiles: exact when the sample covers the
    population, and within the advertised O(1/sqrt(k)) rank-error bound
    when it doesn't."""

    def _truth(self, sf_dir):
        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev[ev.event_id.notna() & ev.value.notna()]
        return {t: g.value.sort_values().to_numpy() for t, g in ev.groupby("event_type")}

    def test_exact_when_sample_covers_population(self, spark, sf_dir):
        # k >= rows-per-type: the sample IS the population, so each pick
        # equals the deterministic-rank quantile of the full value list
        # (tie order between equal values cannot change the value picked)
        truth = self._truth(sf_dir)
        res = SK.kmv_value_quantiles(spark, sf_dir, k=10**6).collect()
        assert len(res) == 4 * len(truth)
        for r in res:
            vals = truth[r.event_type]
            n = len(vals)
            assert r.sample_n == n
            want = round(float(vals[((n - 1) * r.pct) // 100]), 6)
            assert r.q_value == want

    def test_rank_error_bound_small_k(self, spark, sf_dir):
        # k=64: true rank fraction of each picked value must sit within
        # 4*sqrt(p(1-p)/k) of the target percentile (4 s.d. of the
        # uniform-sample rank distribution; deterministic hash => stable)
        truth = self._truth(sf_dir)
        res = SK.kmv_value_quantiles(spark, sf_dir, k=64).collect()
        assert len(res) == 4 * len(truth)
        for r in res:
            vals = truth[r.event_type]
            n = len(vals)
            p = r.pct / 100.0
            bound = 4.0 * (p * (1 - p) / 64) ** 0.5
            lo = (vals < r.q_value - 5e-7).sum() / n
            hi = (vals <= r.q_value + 5e-7).sum() / n
            err = max(lo - p, p - hi, 0.0)
            assert err <= bound, (r.event_type, r.pct, err, bound)
