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


class TestKAnonymityAudit:
    def test_hand_computed(self, spark):
        # QI = city: A has 6 rows, B has 2 -> with k=5, B is at risk;
        # sensitive diversity: A has 2 distinct, B has 1 (worst)
        rows = [("A", i % 2) for i in range(6)] + [("B", 7), ("B", 7)]
        df = spark.createDataFrame(rows, "city string, salary long")
        r = QL.k_anonymity_audit(
            [("city", df, ["city"], "salary")], k=5
        ).collect()[0]
        assert (r.n_groups, r.n_rows) == (2, 8)
        assert (r.n_groups_lt_k, r.n_rows_at_risk) == (1, 2)
        assert (r.min_group_size, r.min_l_diversity) == (2, 1)

    def test_all_groups_pass_k(self, spark):
        df = spark.createDataFrame(
            [("A", i) for i in range(5)] + [("B", i) for i in range(5)],
            "city string, salary long",
        )
        r = QL.k_anonymity_audit(
            [("city", df, ["city"], "salary")], k=5
        ).collect()[0]
        assert (r.n_groups_lt_k, r.n_rows_at_risk) == (0, 0)
        assert r.min_l_diversity == 5


class TestBenfordProfile:
    def test_shares_and_deviation(self, spark):
        # 30 amounts leading 1, 10 leading 2 -> shares 750000 / 250000
        rows = [(1.23,)] * 30 + [(2.5,)] * 10
        df = spark.createDataFrame(rows, "x double")
        got = {r.digit: r for r in QL.benford_profile(df, "x").collect()}
        assert set(got) == {1, 2}
        assert got[1].share_micro == 750_000
        assert got[2].share_micro == 250_000
        assert got[1].benford_micro == 301_030
        assert got[1].dev_micro == 750_000 - 301_030
        assert got[2].dev_micro == 250_000 - 176_091

    def test_nonpositive_amounts_excluded(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (-5.0,), (9.99,)], "x double"
        )
        rows = QL.benford_profile(df, "x").collect()
        assert len(rows) == 1 and rows[0].digit == 9 and rows[0].n == 1

    def test_digit_comes_from_cents(self, spark):
        # 0.05 -> 5 cents -> digit 5 (cent-integer leading digit)
        df = spark.createDataFrame([(0.05,)], "x double")
        assert QL.benford_profile(df, "x").collect()[0].digit == 5


class TestDupOrderAudit:
    def _orders(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [(i, ck, "O", float(tp),
              dt.datetime(2024, 1, d, h), "1-URGENT")
             for i, (ck, tp, d, h) in enumerate(rows)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )

    def test_same_day_same_amount_flagged(self, spark):
        orders = self._orders(
            spark,
            [(1, 99.99, 5, 9), (1, 99.99, 5, 17),   # dup pair
             (1, 99.99, 6, 9),                        # different day
             (2, 50.0, 5, 9)],                        # singleton
        )
        rows = QL.dup_order_audit(orders).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.o_custkey, r.total_cents, r.n_orders) == (1, 9999, 2)

    def test_cent_precision_separates(self, spark):
        orders = self._orders(
            spark, [(1, 10.01, 5, 9), (1, 10.02, 5, 10)]
        )
        assert QL.dup_order_audit(orders).count() == 0


class TestDupOrderOracleParity:
    def test_oracle_matches_on_nonempty_output(self, spark):
        """The sf0.01 gate sees 0 duplicate groups (trivially hash-equal
        empty frames), so pin Spark-vs-DuckDB parity on data that DOES
        produce output: synthetic duplicates incl. a cent-boundary
        amount and a 3-way group (round-8 ADVICE)."""
        import datetime as dt

        import duckdb

        rows = [
            (1, 99.99, 5), (1, 99.99, 5),            # 2-way dup
            (2, 10.005, 6), (2, 10.005, 6), (2, 10.005, 6),  # 3-way, half-cent
            (2, 10.01, 6),                            # near-miss amount
            (3, 50.0, 7),                             # singleton
        ]
        orders = spark.createDataFrame(
            [
                (i, ck, "O", float(tp), dt.datetime(2024, 1, d), "1-URGENT")
                for i, (ck, tp, d) in enumerate(rows)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        got = sorted(
            tuple(r) for r in QL.dup_order_audit(orders).collect()
        )
        con = duckdb.connect()
        vals = ", ".join(
            f"({ck}, {tp!r}, TIMESTAMP '2024-01-{d:02d} 00:00:00')"
            for (ck, tp, d) in rows
        )
        con.execute(
            "CREATE VIEW orders AS SELECT CAST(c AS BIGINT) AS o_custkey,"
            " CAST(p AS DOUBLE) AS o_totalprice, t AS o_orderdate"
            f" FROM (VALUES {vals}) v(c, p, t)"
        )
        want = sorted(
            map(tuple, con.execute(QL.dup_order_oracle_sql()).fetchall())
        )
        assert len(got) == 2  # non-empty: the parity check has teeth
        assert got == want
