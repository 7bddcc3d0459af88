"""Connector retry/throttle parity (sources/reddit_api.py vs reference
extract-from-reddit.py:35-59 retry x3/5s, :85-88 1s-per-100 throttle)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.sources.reddit_api import (  # noqa: E402
    FakeRedditSource,
    fetch_posts_df,
    throttled,
    with_retry,
)


class FlakyConnect:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError(f"transient failure {self.calls}")
        return "connection"


def test_retry_recovers_after_transient_failures():
    sleeps = []
    flaky = FlakyConnect(fail_times=2)
    assert with_retry(flaky, sleep=sleeps.append) == "connection"
    assert flaky.calls == 3
    assert sleeps == [5.0, 5.0]  # fixed 5s backoff between attempts


def test_retry_exhaustion_raises_with_cause():
    sleeps = []
    flaky = FlakyConnect(fail_times=99)
    with pytest.raises(ConnectionError, match="after 3 attempts"):
        with_retry(flaky, sleep=sleeps.append)
    assert flaky.calls == 3
    assert sleeps == [5.0, 5.0]  # no sleep after the final failure


def test_throttle_sleeps_once_per_hundred():
    sleeps = []
    out = list(throttled(range(250), sleep=sleeps.append))
    assert out == list(range(250))
    assert sleeps == [1.0, 1.0]  # after post 100 and post 200, not 250


def test_fetch_with_flaky_fetcher_end_to_end(spark):
    """Retry wraps the connect seam; the materialized frame is unaffected
    by transient connect failures."""
    sleeps = []
    flaky = FlakyConnect(fail_times=1)

    def fetcher():
        with_retry(flaky, sleep=sleeps.append)  # connect, with retries
        return FakeRedditSource(n=120)()

    df = fetch_posts_df(spark, fetcher)
    assert df.count() == 120
    assert flaky.calls == 2 and sleeps == [5.0]
