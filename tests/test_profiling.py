"""Profiling / planning diagnostics: join-key skew stats and the
categorical cardinality/Gini profile."""

from reddit_etl_pipeline_spark.operators import quality as QL
from reddit_etl_pipeline_spark.operators import skew as SKW


class TestJoinSkewStats:
    def test_hand_computed(self, spark):
        # key degrees: x=3, y=2, z=1 -> pairs 9, 4, 1; total 14
        df = spark.createDataFrame(
            [("x",)] * 3 + [("y",)] * 2 + [("z",)], "k string"
        )
        rows = SKW.join_skew_stats(df, "k", top_n=10).collect()
        got = {r.k: (r.deg, r.pairs, r.share_micro) for r in rows}
        assert got == {
            "x": (3, 9, 9 * 1_000_000 // 14),
            "y": (2, 4, 4 * 1_000_000 // 14),
            "z": (1, 1, 1 * 1_000_000 // 14),
        }
        # ordered by pairs desc
        assert [r.k for r in rows] == ["x", "y", "z"]

    def test_top_n_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",)], "k string"
        )
        rows = SKW.join_skew_stats(df, "k", top_n=2).collect()
        # all deg 1 -> tie broken by key asc
        assert [r.k for r in rows] == ["a", "b"]


class TestCategoricalProfile:
    def test_hand_computed_gini(self, spark):
        # counts: A=2, B=1, C=1 -> N=4, sum c^2 = 6
        # gini = (16-6)/16 = 0.625 -> 625000
        df = spark.createDataFrame(
            [("A",), ("A",), ("B",), ("C",)], "v string"
        )
        r = QL.categorical_profile([("t.v", df, "v")]).collect()[0]
        assert (r.n, r.n_distinct, r.top1_n) == (4, 3, 2)
        assert r.top1_share_micro == 500_000
        assert r.gini_micro == 625_000

    def test_constant_column_gini_zero(self, spark):
        df = spark.createDataFrame([("A",)] * 5, "v string")
        r = QL.categorical_profile([("t.v", df, "v")]).collect()[0]
        assert r.gini_micro == 0
        assert r.top1_share_micro == 1_000_000

    def test_null_is_its_own_category(self, spark):
        df = spark.createDataFrame([("A",), (None,), (None,)], "v string")
        r = QL.categorical_profile([("t.v", df, "v")]).collect()[0]
        assert (r.n, r.n_distinct, r.top1_n) == (3, 2, 2)

    def test_multi_column_union_ordered(self, spark):
        d1 = spark.createDataFrame([("A",)], "v string")
        d2 = spark.createDataFrame([(1,), (2,)], "w long")
        rows = QL.categorical_profile(
            [("z.col", d1, "v"), ("a.col", d2, "w")]
        ).collect()
        assert [r["column"] for r in rows] == ["a.col", "z.col"]


class TestStreamCategoricalProfile:
    def test_stream_equals_batch(self, spark, sf_dir):
        """Per-value counts obey the SUM merge law, so the continuous
        profile must equal the batch profile of the same column."""
        from reddit_etl_pipeline_spark.plans.star import load
        from reddit_etl_pipeline_spark.streaming.stream import (
            streamed_categorical_profile,
        )

        batch = QL.categorical_profile(
            [("events.event_type", load(spark, sf_dir, "events"),
              "event_type")]
        ).collect()
        stream = streamed_categorical_profile(spark, sf_dir).collect()
        assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


class TestFkIntegrityAudit:
    def test_engineered_orphans(self, spark):
        child = spark.createDataFrame(
            [(1,), (2,), (3,), (None,), (9,)], "fk long"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        r = QL.fk_integrity_audit(
            [("c.fk->p", child, "fk", parent, "pk")]
        ).collect()[0]
        assert (r.n_child, r.n_orphans) == (5, 2)  # NULL + 9

    def test_clean_relation_zero_orphans(self, spark):
        child = spark.createDataFrame([(1,), (1,), (2,)], "fk long")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        r = QL.fk_integrity_audit(
            [("c.fk->p", child, "fk", parent, "pk")]
        ).collect()[0]
        assert (r.n_child, r.n_orphans) == (3, 0)

    def test_duplicate_parent_keys_do_not_inflate_child_count(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "fk long")
        parent = spark.createDataFrame([(1,), (1,), (2,)], "pk long")
        r = QL.fk_integrity_audit(
            [("c.fk->p", child, "fk", parent, "pk")]
        ).collect()[0]
        assert (r.n_child, r.n_orphans) == (2, 0)


class TestNumericProfile:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1.5,), (-2.25,), (0.0,), (None,)], "x double"
        )
        r = QL.numeric_profile([("t.x", df, "x")]).collect()[0]
        assert (r.n, r.n_null, r.n_zero, r.n_negative) == (4, 1, 1, 1)
        assert r.min_micro == -2_250_000
        assert r.max_micro == 1_500_000
        assert r.sum_micro == -750_000

    def test_all_null_column(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "x double")
        r = QL.numeric_profile([("t.x", df, "x")]).collect()[0]
        assert (r.n, r.n_null, r.sum_micro) == (2, 2, 0)
        assert r.min_micro is None and r.max_micro is None
