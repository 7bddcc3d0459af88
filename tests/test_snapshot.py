"""Snapshot diff (operators/snapshot.py) and the daily-count anomaly
monitor: known-value classification, NULL-text semantics, z-score
invariants, and stream==batch for the PIT twin."""

from pyspark.sql import functions as F

from reddit_etl_pipeline_spark.operators.snapshot import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_snapshot_diff_known_classification(spark):
    old = _snap(
        spark,
        [
            (1, "a", "same"),
            (2, "a", "before"),
            (3, "a", "gone"),
            (5, "a", None),
            (6, "a", None),
            (7, "a", "was text"),
        ],
    )
    new = _snap(
        spark,
        [
            (1, "a", "same"),      # unchanged
            (2, "a", "after"),     # changed
            (4, "a", "fresh"),     # added
            (5, "a", None),        # NULL -> NULL: unchanged
            (6, "a", "now text"),  # NULL -> text: changed
            (7, "a", None),        # text -> NULL: changed
        ],
    )
    row = snapshot_diff(old, new).collect()[0]
    assert (row.n_added, row.n_removed, row.n_changed, row.n_unchanged) == (
        1,
        1,
        3,
        2,
    )


def test_snapshot_diff_source_of_removed_is_old(spark):
    old = _snap(spark, [(1, "legacy", "x")])
    new = _snap(spark, [(2, "fresh", "y")])
    got = {r.source: (r.n_added, r.n_removed) for r in snapshot_diff(old, new).collect()}
    assert got == {"legacy": (0, 1), "fresh": (1, 0)}


def test_daily_anomaly_z_invariants(spark, sf_dir):
    """Per type: Σz == 0 exactly up to rounding (the numerator sums to
    zero in integers), n sums to the event count, and the flag is
    consistent with |z| > 2."""
    from reddit_etl_pipeline_spark.plans.star import daily_count_anomalies, load

    df = daily_count_anomalies(spark, sf_dir)
    rows = df.collect()
    assert all(r.is_anomaly == (1 if abs(r.z_score) > 2.0 else 0) for r in rows)
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    total = load(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == total
    for t, rs in per_type.items():
        assert abs(sum(r.z_score for r in rs)) < 1e-3, t


def test_daily_anomaly_constant_counts_define_z_zero(spark, tmp_path):
    """Constant daily counts (zero variance) must yield z = 0, not NaN."""
    import datetime

    from reddit_etl_pipeline_spark.plans.star import daily_count_anomalies

    rows = [
        (i, datetime.datetime(2024, 1, 1 + d, 12, 0, 0), i, "steady", 1.0, None)
        for d in range(3)
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p)
    out = daily_count_anomalies(spark, str(tmp_path)).collect()
    assert len(out) == 3 and all(r.z_score == 0.0 and r.is_anomaly == 0 for r in out)


class TestEdgeChurn:
    def _tables(self, spark, orders_rows, li_rows):
        import datetime as dt

        orders = spark.createDataFrame(
            [
                (ok, 1, "O", 10.0, dt.datetime(y, m, 15), "1-URGENT")
                for (ok, y, m) in orders_rows
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        li = spark.createDataFrame(
            [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              dt.datetime(2024, 1, 1)) for (ok, pk) in li_rows],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        )
        return li, orders

    def test_hand_computed_churn(self, spark):
        from reddit_etl_pipeline_spark.operators.snapshot import (
            edge_churn_by_month,
        )

        # month 1 (2024-01): orders 1 {A,B,C} -> edges AB AC BC
        # month 2 (2024-02): order 2 {A,B}, order 3 {B,D} -> edges AB BD
        # kept AB; removed AC BC; added BD
        li, orders = self._tables(
            spark,
            [(1, 2024, 1), (2, 2024, 2), (3, 2024, 2)],
            [(1, 101), (1, 102), (1, 103), (2, 101), (2, 102),
             (3, 102), (3, 104)],
        )
        rows = edge_churn_by_month(li, orders).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.total_m, r.total_next, r.kept, r.added, r.removed) == (
            3, 2, 1, 1, 2,
        )
        assert r.churn_micro == 2 * 1_000_000 // 3

    def test_disjoint_months_full_churn(self, spark):
        from reddit_etl_pipeline_spark.operators.snapshot import (
            edge_churn_by_month,
        )

        li, orders = self._tables(
            spark,
            [(1, 2024, 1), (2, 2024, 2)],
            [(1, 101), (1, 102), (2, 103), (2, 104)],
        )
        r = edge_churn_by_month(li, orders).collect()[0]
        assert (r.kept, r.added, r.removed) == (0, 1, 1)
        assert r.churn_micro == 1_000_000

    def test_gap_months_skipped(self, spark):
        from reddit_etl_pipeline_spark.operators.snapshot import (
            edge_churn_by_month,
        )

        # months jan and MARCH: no consecutive pair -> empty result
        li, orders = self._tables(
            spark,
            [(1, 2024, 1), (2, 2024, 3)],
            [(1, 101), (1, 102), (2, 101), (2, 102)],
        )
        assert edge_churn_by_month(li, orders).count() == 0

    def test_year_boundary_is_consecutive(self, spark):
        from reddit_etl_pipeline_spark.operators.snapshot import (
            edge_churn_by_month,
        )

        # dec 2023 -> jan 2024 must count as consecutive months
        li, orders = self._tables(
            spark,
            [(1, 2023, 12), (2, 2024, 1)],
            [(1, 101), (1, 102), (2, 101), (2, 102)],
        )
        r = edge_churn_by_month(li, orders).collect()[0]
        assert (r.kept, r.churn_micro) == (1, 0)
