"""Stateful streaming sessionizer (streaming/stream.py) vs the batch
sessionize — same gap rule, same output."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.plans import star as Q  # noqa: E402
from reddit_etl_pipeline_spark.streaming import stream as ST  # noqa: E402


def test_streamed_sessionize_equals_batch(spark, sf_dir):
    got = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            round(r.session_value, 5),
        )
        for r in ST.streamed_sessionize(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.session_start,
            r.session_end,
            round(r.session_value, 5),
        )
        for r in Q.sessionize(spark, sf_dir).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_streamed_distinct_users_equals_batch(spark, sf_dir):
    got = {
        (r.user_id, r.event_type)
        for r in ST.streamed_distinct_users(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in Q.load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want
