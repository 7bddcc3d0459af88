"""As-of join semantics (operators/asof.py)."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.operators.asof import asof_join  # noqa: E402


def test_asof_join_at_or_before(spark):
    t = lambda h, m=0: dt.datetime(2025, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(12)), (3, "u", t(9)), (4, "v", t(10))],
        "order_id long, k string, ots timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(10), 100.0), ("u", t(11), 200.0), ("w", t(1), 9.0)],
        "k string, ts timestamp, value double",
    )
    out = {
        r.order_id: r.asof_value
        for r in asof_join(
            left, right, by="k", left_ts="ots", right_ts="ts", value_cols=["value"]
        ).collect()
    }
    assert out[1] == 100.0  # tie: event AT the left ts counts
    assert out[2] == 200.0  # latest at-or-before 12:00
    assert out[3] is None  # nothing before 9:00
    assert out[4] is None  # key with no right rows at all


def test_range_join_bucketed_exact_window(spark):
    t = lambda h, m, s=0: dt.datetime(2025, 1, 1, h, m, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(12, 0))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", t(11, 0), 1.0),   # exactly at lower bound -> included
            ("u", t(11, 30), 2.0),  # inside
            ("u", t(12, 0), 4.0),   # at upper bound (exclusive) -> out
            ("u", t(10, 59, 59), 8.0),  # just below lower -> out
            ("v", t(11, 30), 16.0),  # other key -> out
        ],
        "k string, ts timestamp, value double",
    )
    from reddit_etl_pipeline_spark.operators.asof import range_join_bucketed

    out = range_join_bucketed(
        left, right, by="k", left_ts="lts", right_ts="ts",
        lower_seconds=-3600, upper_seconds=0,
    )
    vals = sorted(r.r_value for r in out.collect())
    assert vals == [1.0, 2.0]


def test_asof_join_carries_null_value_of_matched_row(spark):
    """A matched right row whose value is NULL must yield NULL (ASOF
    semantics) — not resurrect an older non-null value."""
    t = lambda h: dt.datetime(2025, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(12))], "order_id long, k string, ots timestamp"
    )
    right = spark.createDataFrame(
        [("u", t(10), 5.0), ("u", t(11), None)],
        "k string, ts timestamp, value double",
    )
    out = asof_join(
        left, right, by="k", left_ts="ots", right_ts="ts", value_cols=["value"]
    ).collect()
    assert out[0].asof_value is None


def test_asof_join_forward_at_or_after(spark):
    """direction='forward': earliest right row at-or-after each left ts;
    equal timestamps match; rows with nothing after get NULL."""
    t = lambda h: dt.datetime(2025, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(12)), (3, "u", t(23)), (4, "v", t(5))],
        "order_id long, k string, ots timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(10), 1.0), ("u", t(11), 2.0), ("u", t(15), 3.0)],
        "k string, ts timestamp, value double",
    )
    out = {
        r.order_id: r.asof_value
        for r in asof_join(
            left, right, by="k", left_ts="ots", right_ts="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    assert out == {1: 1.0, 2: 3.0, 3: None, 4: None}
