"""Hot-bucket splitting for hyperplane LSH (similarity.split_hot_buckets).

The 100x candidate-volume audit showed mean bucket occupancy flat under
auto_planes but MAX occupancy growing (hub vectors): per-bucket verify
cost is quadratic in occupancy, so the fix subdivides over-cap buckets
with extra refinement planes while keeping the equi-join shape. These
tests pin:
  - occupancy is bounded by the cap for splittable (diverse) buckets
  - identical-direction groups are left intact (unsplittable) and the
    loop still terminates
  - splitting only REMOVES candidate pairs (subset property)
  - strong near-dup pairs survive splitting (recall floor): twins share
    refinement bits, so they stay co-bucketed
"""

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators import similarity as S  # noqa: E402

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )


def _occupancy(b, key):
    return [r.n for r in b.groupBy(*key).agg(F.count(F.lit(1)).alias("n")).collect()]


def test_split_bounds_occupancy_for_diverse_buckets(spark):
    # 2 base planes -> 4 buckets for 600 random vectors: every bucket is
    # far over cap=48, but random vectors differ in refinement planes, so
    # splitting must bound every refined group at <= cap
    rng = random.Random(7)
    df = _mk(spark, [_unit(rng) for _ in range(600)])
    b = S.lsh_bucket_table(df, DIM, n_planes=2, n_tables=2, extra_bits=16)
    split = S.split_hot_buckets(b, cap=48, extra_bits=16)
    occ = _occupancy(split, ["tbl", "bucket", "lvl", "sub"])
    assert max(occ) <= 48, sorted(occ)[-5:]
    # every vector keeps exactly one key per table
    assert split.count() == 600 * 2


def test_identical_direction_group_left_intact(spark):
    # 200 copies of one direction cannot be separated by hyperplanes:
    # the loop must terminate with the group intact, not spin
    rng = random.Random(11)
    hub = _unit(rng)
    df = _mk(spark, [hub[:] for _ in range(200)] + [_unit(rng) for _ in range(50)])
    b = S.lsh_bucket_table(df, DIM, n_planes=4, n_tables=2, extra_bits=8)
    split = S.split_hot_buckets(b, cap=32, max_rounds=6, extra_bits=8)
    occ = _occupancy(split, ["tbl", "bucket", "lvl", "sub"])
    # the hub group survives whole (>= 200 members in its refined bucket)
    assert max(occ) >= 200
    # and hub members all reached the bit-exhaustion level in both tables
    hub_lvls = {
        r.lvl
        for r in split.join(
            df.filter(F.col("vec_id") < 200).select(
                F.col("vec_id").alias("did")
            ),
            "did",
        ).collect()
    }
    assert hub_lvls == {8}


def test_split_candidates_are_subset_and_strong_pairs_survive(spark):
    # corpus: 150 random vectors + 40 tight twin pairs (strong near-dups)
    rng = random.Random(23)
    base = [_unit(rng) for _ in range(150)]
    twins = []
    twin_ids = []
    for t in range(40):
        v = _unit(rng)
        w = [x + rng.gauss(0, 0.01) for x in v]
        n = math.sqrt(sum(x * x for x in w))
        w = [x / n for x in w]
        twin_ids.append((len(base) + len(twins), len(base) + len(twins) + 1))
        twins += [v, w]
    df = _mk(spark, base + twins)

    kw = dict(threshold=0.9, n_planes=3, n_tables=6)
    with_split = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs(
            df, DIM, bucket_cap=16, split_bits=12, **kw
        ).collect()
    }
    no_split = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs(df, DIM, bucket_cap=None, **kw).collect()
    }
    # splitting only removes candidates, never invents pairs
    assert with_split <= no_split
    # twins agree on (almost) every refinement plane, so they stay
    # co-bucketed through splitting: recall floor on the strong pairs
    found = sum(1 for p in twin_ids if p in with_split)
    assert found / len(twin_ids) >= 0.85, (found, len(twin_ids))


def test_default_cap_matches_unsplit_on_uniform_corpus(spark):
    # no bucket exceeds the default cap on a small uniform corpus ->
    # split path must produce IDENTICAL pairs to the unsplit path
    rng = random.Random(5)
    df = _mk(spark, [_unit(rng) for _ in range(300)])
    kw = dict(threshold=0.4, n_planes=4, n_tables=4)
    a = {
        (r.id_a, r.id_b, r.sim)
        for r in S.embedding_neardup_pairs(df, DIM, **kw).collect()
    }
    b = {
        (r.id_a, r.id_b, r.sim)
        for r in S.embedding_neardup_pairs(df, DIM, bucket_cap=None, **kw).collect()
    }
    assert a == b


def test_cosine_topk_lsh_split_probes_refined_buckets(spark):
    """Query-side splitting: corpus with a dense region forces splits;
    the split path must (a) agree with the unsplit path's top-k for
    queries whose nearest neighbors are genuinely close (twin pairs) and
    (b) still return k results per query."""
    rng = random.Random(31)
    base = [_unit(rng) for _ in range(250)]
    # queries are twins of known corpus vectors -> rank-1 neighbor known
    qs = []
    for t in range(12):
        v = base[t]
        w = [x + rng.gauss(0, 0.005) for x in v]
        n = math.sqrt(sum(x * x for x in w))
        qs.append([x / n for x in w])
    corpus = _mk(spark, base)
    queries = spark.createDataFrame(
        [(1000 + i, v) for i, v in enumerate(qs)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(k=3, n_planes=2, n_tables=8)  # 4 buckets -> every bucket hot
    split = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.cosine_topk_lsh(
            corpus, queries, DIM, bucket_cap=16, split_bits=12, **kw
        ).collect()
    }
    # every query keeps k results and finds its twin at rank 1
    for i in range(12):
        assert split[(1000 + i, 1)] == i
        assert (1000 + i, 3) in split
