"""Entity resolution (operators/resolve.py): wildcard-position variant
blocking must be EXACT for the advertised substitution distance (no
candidate lost, none invented), verification exact, resolution
deterministic."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_etl_pipeline_spark.operators.resolve import (  # noqa: E402
    corrupt_names,
    fuzzy_resolve,
)


def _clean(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "clean_id long, name string"
    )


def test_blocking_complete_for_substitutions(spark):
    """Candidate generation is EXACT for the aligned-substitution model:
    compare fuzzy_resolve to a brute-force Hamming join (verify distance
    = levenshtein, like the operator) on a corpus with shared prefixes —
    the shape that hot-blocked the segment scheme this replaced."""
    names = [
        "abcdefghijkl",
        "abcdefghijkX",  # dist 1, last char
        "Xbcdefghijkl",  # dist 1, first char
        "abcdeXghijkX",  # dist 2, middle + last
        "XbcdeXghijkl",  # dist 2, first + middle
        "zzzzzzzzzzzz",  # unrelated
        "shared_pref_1",  # constant-prefix family (the old hot block)
        "shared_pref_2",
        "shared_pref_3",
    ]
    clean = _clean(spark, names)
    dirty = clean.select(
        F.col("clean_id").alias("dirty_id"), "name"
    )
    out = fuzzy_resolve(dirty, clean, max_dist=2)
    got = {
        r.dirty_id: (r.resolved_id, r.distance, r.n_candidates)
        for r in out.collect()
    }
    rows = [(i, n) for i, n in enumerate(names)]

    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b)) if len(a) == len(b) else 99

    for did, dname in rows:
        cands = sorted(
            (lev(dname, cname), cid)
            for cid, cname in rows
            if hamming(dname, cname) <= 2
        )
        assert got[did][0] == cands[0][1], (did, got[did], cands)
        assert got[did][1] == cands[0][0]
        assert got[did][2] == len(cands)


def test_short_and_unequal_lengths(spark):
    """Sentinel path: names shorter than max_dist match any equal-length
    name; unequal lengths never become candidates (substitution model)."""
    clean = _clean(spark, ["a", "b", "ab", "abcd"])
    dirty = clean.select(F.col("clean_id").alias("dirty_id"), "name")
    out = {
        r.dirty_id: (r.resolved_id, r.distance, r.n_candidates)
        for r in fuzzy_resolve(dirty, clean, max_dist=2).collect()
    }
    assert out[0] == (0, 0, 2)  # "a": itself + "b" (ALL block, len 1)
    assert out[1] == (1, 0, 2)
    assert out[2] == (2, 0, 1)  # "ab": only itself (len-2 full mask)
    assert out[3] == (3, 0, 1)


def test_max_dist_1_variant_keys(spark):
    clean = _clean(spark, ["abcde", "abcdX", "abXdX"])
    dirty = clean.select(F.col("clean_id").alias("dirty_id"), "name")
    out = {
        r.dirty_id: (r.resolved_id, r.n_candidates)
        for r in fuzzy_resolve(dirty, clean, max_dist=1).collect()
    }
    # 0-1 within dist 1; 1-2 within dist 1; 0-2 is dist 2 -> excluded
    assert out[0] == (0, 2) and out[1] == (1, 3) and out[2] == (2, 2)


def lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_corrupt_names_single_substitution(spark):
    clean = _clean(spark, [f"Customer#{i:09d}" for i in range(20)])
    dirty = corrupt_names(
        clean.select(F.col("clean_id").alias("c_custkey"),
                     F.col("name").alias("c_name")),
        "c_custkey", "c_name", every=5,
    )
    rows = {r.dirty_id: r.name for r in dirty.collect()}
    assert sorted(rows) == [0, 5, 10, 15]
    for i, name in rows.items():
        orig = f"Customer#{i:09d}"
        assert lev(name, orig) == 1
        assert name[10 + i % 8 - 1] == "#"


def test_resolution_finds_planted_duplicates(spark):
    """Corrupted names resolve at distance 1; ambiguity (another clean
    name differing only at the corrupted position) breaks to the lowest
    key — deterministic, and the true id whenever it IS the minimum."""
    clean = _clean(spark, [f"Customer#{i:09d}" for i in range(100)])
    dirty = corrupt_names(
        clean.select(F.col("clean_id").alias("c_custkey"),
                     F.col("name").alias("c_name")),
        "c_custkey", "c_name", every=5,
    )
    out = {r.dirty_id: r for r in fuzzy_resolve(dirty, clean, max_dist=2).collect()}
    assert len(out) == 20
    hits = 0
    for did, r in out.items():
        assert r.distance == 1
        hits += r.resolved_id == did
    assert hits >= 16  # most corruptions are unambiguous


def test_no_cartesian_in_plan(spark):
    """Blocking must plan as an equi-join on the variant block key — never a
    BroadcastNestedLoopJoin / CartesianProduct over the two relations."""
    clean = _clean(spark, [f"Customer#{i:09d}" for i in range(50)])
    dirty = clean.select(F.col("clean_id").alias("dirty_id"), "name")
    plan = fuzzy_resolve(dirty, clean)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_multiplicity_parity(spark):
    """Round-7 collapse fix: resolving a dup-heavy relation (every name
    appearing m times under distinct ids) must give each dirty record
    exactly the result its name gets at m=1, with n_candidates counting
    clean IDs (not distinct clean names) and ties resolved to the
    MINIMUM clean id overall."""
    base = ["abcdefghijkl", "abcdefghijkX", "zzzzzzzzzzzz"]
    m = 7
    # clean: each name under m distinct ids; id layout interleaved so
    # min-id-per-name is non-trivial
    clean_rows = [
        (k * 100 + i, n) for i, n in enumerate(base) for k in range(m)
    ]
    clean = spark.createDataFrame(clean_rows, "clean_id long, name string")
    dirty_rows = [
        (k * 1000 + i, n) for i, n in enumerate(base) for k in range(m)
    ]
    dirty = spark.createDataFrame(dirty_rows, "dirty_id long, name string")

    got = {
        r.dirty_id: (r.resolved_id, r.distance, r.n_candidates)
        for r in fuzzy_resolve(dirty, clean, max_dist=2).collect()
    }
    assert len(got) == len(dirty_rows)

    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b)) if len(a) == len(b) else 99

    for did, dname in dirty_rows:
        cands = sorted(
            (hamming(dname, cname), cid)
            for cid, cname in clean_rows
            if hamming(dname, cname) <= 2
        )
        assert got[did] == (cands[0][1], cands[0][0], len(cands)), (
            did,
            dname,
            got[did],
            cands[:3],
        )
