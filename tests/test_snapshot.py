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
