"""Reddit API batch source — pluggable fetcher, Spark materialization.

The reference scans a subreddit via PRAW (reference
``airflow/extraction/extract-from-reddit.py:61-75``), projects each
submission onto the 13-field list by ``vars(submission)`` dict-get
(``:90-91`` — missing attr -> null), stringifies ``author`` (``:97-99``),
throttles 1s/100 posts (``:85-88``) and retries the connection 3x with 5s
backoff (``:35-59``).

Spark-first split: everything network-ish (HTTP, retry, throttle,
pagination) lives in a *fetcher* callable that yields plain dicts; the
engine materializes them with ``spark.createDataFrame(rows, RAW_SCHEMA)``.
PRAW is not in this environment, so the real fetcher is gated behind an
import-try; ``FakeRedditSource`` provides deterministic synthetic
submissions for tests and offline runs.

Scale note: the Reddit API is rate-limited to ~100 rows/s — the source is
never the distributed part. One driver-side fetch per (subreddit, day)
batch into a DataFrame is the right shape; fan-out across subreddits would
parallelize fetchers, not Spark tasks.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..schema import POST_FIELDS, RAW_POSTS_SCHEMA

RATE_LIMIT_BATCH = 100  # posts per throttle window (extract-from-reddit.py:85-88)
RATE_LIMIT_SLEEP_S = 1.0
CONNECT_RETRIES = 3  # extract-from-reddit.py:35-59
RETRY_DELAY_S = 5.0


def project_submission(obj: object, fields: list[str] | None = None) -> dict:
    """``{field: vars(sub).get(field)}`` projection (extract-from-reddit.py:90-91)
    with author stringification (:97-99)."""
    d = vars(obj) if not isinstance(obj, dict) else obj
    row = {f: d.get(f) for f in (fields or POST_FIELDS)}
    if row.get("author") is not None:
        row["author"] = str(row["author"])
    # API booleans arrive as real bools; warehouse stores 'False'/'True' text.
    for b in ("over_18", "spoiler", "stickied"):
        if isinstance(row.get(b), bool):
            row[b] = str(row[b])
    if row.get("score") is not None:
        row["score"] = int(row["score"])
    if row.get("num_comments") is not None:
        row["num_comments"] = int(row["num_comments"])
    if row.get("created_utc") is not None:
        row["created_utc"] = float(row["created_utc"])
    return row


def with_retry(connect: Callable[[], object], retries: int = CONNECT_RETRIES,
               delay_s: float = RETRY_DELAY_S, sleep=time.sleep) -> object:
    """3-try connect with fixed backoff (extract-from-reddit.py:35-59)."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return connect()
        except Exception as exc:  # noqa: BLE001 — parity with reference
            last = exc
            if attempt < retries - 1:
                sleep(delay_s)
    raise ConnectionError(f"API connect failed after {retries} attempts") from last


def throttled(posts: Iterable[object], batch: int = RATE_LIMIT_BATCH,
              sleep=time.sleep, delay_s: float = RATE_LIMIT_SLEEP_S) -> Iterator[object]:
    """1s pause per 100 posts (extract-from-reddit.py:85-88)."""
    for i, p in enumerate(posts, 1):
        yield p
        if i % batch == 0:
            sleep(delay_s)


def fetch_posts_df(
    spark: SparkSession,
    fetcher: Callable[[], Iterable[object]],
    throttle: bool = False,
) -> DataFrame:
    """Materialize a fetcher's submissions as the RAW 13-column relation.

    Empty fetch -> typed empty frame (empty-input guard,
    extract-from-reddit.py:106-108).
    """
    it: Iterable[object] = fetcher()
    if throttle:
        it = throttled(it)
    rows = [project_submission(p) for p in it]
    return spark.createDataFrame(rows, RAW_POSTS_SCHEMA)


class FakeRedditSource:
    """Deterministic synthetic subreddit listing for tests/offline runs.

    Mimics ``subreddit_posts(reddit, name, time_filter, limit)``
    (extract-from-reddit.py:61-75) without the network. Seeded arithmetic,
    no RNG state — same args always produce the same posts.
    """

    def __init__(self, subreddit: str = "stocks", n: int = 185, day: int = 0):
        self.subreddit = subreddit
        self.n = n
        self.day = day

    def __call__(self) -> Iterator[dict]:
        base_epoch = 1742169600.0 + self.day * 86400  # 2025-03-17 UTC
        for i in range(self.n):
            k = i + self.day * 13
            yield {
                "id": _base36(1_000_000 + i),
                "title": f"Post {i} about {'$GME' if i % 7 == 0 else 'markets'}",
                "score": (k * 37) % 20_000 if k % 11 else None,
                "num_comments": (k * 17) % 5_000 if k % 13 else None,
                "author": None if i % 29 == 0 else f"user_{k % 97}",
                "created_utc": base_epoch + (i * 3571) % 604800,
                "url": f"https://reddit.com/r/{self.subreddit}/{_base36(1_000_000 + i)}",
                "upvote_ratio": None if k % 19 == 0 else round(0.5 + (k % 50) / 100, 2),
                "over_18": "True" if i % 23 == 0 else "False",
                "spoiler": "True" if i % 31 == 0 else "False",
                "stickied": "True" if i < 2 else "False",
                "selftext": None if i % 5 == 0 else (f"line one\nline two, \"quoted\" {i}" * (1 + i % 3)),
                "subreddit": self.subreddit,
            }


def _base36(n: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while n:
        n, r = divmod(n, 36)
        out = digits[r] + out
    return out or "0"


try:  # real connector, only if praw is installed (not in this image)
    import praw  # type: ignore # noqa: F401

    def praw_fetcher(client_id: str, secret: str, subreddit: str,
                     time_filter: str = "day", limit: int | None = None):
        """Live fetcher matching api_connect + subreddit_posts
        (extract-from-reddit.py:35-75)."""
        def fetch():
            reddit = with_retry(
                lambda: praw.Reddit(client_id=client_id, client_secret=secret,
                                    user_agent="reddit_etl_pipeline_spark")
            )
            return reddit.subreddit(subreddit).top(time_filter=time_filter, limit=limit)
        return fetch
except ImportError:  # pragma: no cover
    praw_fetcher = None
