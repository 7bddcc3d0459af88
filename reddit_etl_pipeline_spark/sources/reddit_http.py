"""Live Reddit API client over stdlib HTTP — the reference's PRAW seam
(``airflow/extraction/extract-from-reddit.py:35-75``) made real without
the PRAW dependency.

Speaks the actual Reddit data API: OAuth2 client-credentials token
exchange (what ``praw.Reddit(client_id, client_secret, user_agent)``
does under the hood), then paginated ``GET /r/{sub}/top`` listing pages
(what ``subreddit.top(time_filter=..., limit=...)`` iterates). Every
endpoint/clock is injectable so the client is fully testable against a
localhost fake server (this sandbox has no outbound network); the
defaults point at the public API.

Composition: ``RedditHttpClient(...).top(...)`` yields the same
plain-dict submissions ``FakeRedditSource`` yields, so
``fetch_posts_df(spark, client.subreddit_top(...))`` materializes either
source identically — the engine's Spark side never knows which one ran.

Scale note (same as reddit_api.py): the API is rate-limited (~100
rows/request, 1s throttle per 100 posts) — fetch is a driver-side seam,
never the distributed part.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from .reddit_api import CONNECT_RETRIES, RETRY_DELAY_S, with_retry

DEFAULT_TOKEN_URL = "https://www.reddit.com/api/v1/access_token"
DEFAULT_API_URL = "https://oauth.reddit.com"
PAGE_SIZE = 100  # the API caps listing pages at 100 children
TRANSIENT_STATUSES = frozenset({429, 500, 502, 503, 504})


class RedditApiError(ConnectionError):
    """Token exchange failed or a request exhausted its retries."""


class RedditHttpClient:
    """Minimal authenticated Reddit reader: token + paginated listings.

    Parity with the reference connect path (extract-from-reddit.py:35-59):
    the token exchange runs under the same x3 / 5 s ``with_retry`` regime;
    per-request transient failures (429/5xx) retry in-place, and a 401
    mid-session refreshes the token once (tokens expire hourly).
    """

    def __init__(
        self,
        client_id: str,
        client_secret: str,
        user_agent: str = "Data Pipeline/1.0",  # extract-from-reddit.py:35
        token_url: str = DEFAULT_TOKEN_URL,
        api_url: str = DEFAULT_API_URL,
        timeout_s: float = 10.0,
        retries: int = CONNECT_RETRIES,
        retry_delay_s: float = RETRY_DELAY_S,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.client_id = client_id
        self.client_secret = client_secret
        self.user_agent = user_agent
        self.token_url = token_url
        self.api_url = api_url.rstrip("/")
        self.timeout_s = timeout_s
        self.retries = retries
        self.retry_delay_s = retry_delay_s
        self._sleep = sleep
        self._token: str | None = None

    # -- auth ----------------------------------------------------------

    def connect(self) -> "RedditHttpClient":
        """Acquire a bearer token, x3 with 5 s backoff like the reference
        ``api_connect``. Returns self for chaining."""
        self._token = with_retry(
            self._fetch_token,
            retries=self.retries,
            delay_s=self.retry_delay_s,
            sleep=self._sleep,
        )
        return self

    def _fetch_token(self) -> str:
        cred = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()
        ).decode()
        req = urllib.request.Request(
            self.token_url,
            data=urllib.parse.urlencode(
                {"grant_type": "client_credentials"}
            ).encode(),
            headers={
                "Authorization": f"Basic {cred}",
                "User-Agent": self.user_agent,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read().decode())
        token = payload.get("access_token")
        if not token:
            raise RedditApiError(f"no access_token in response: {payload}")
        return token

    # -- requests ------------------------------------------------------

    def _get(self, path: str, params: dict) -> dict:
        """Authenticated GET with transient-status retries and a one-shot
        token refresh on 401."""
        if self._token is None:
            self.connect()
        url = f"{self.api_url}{path}?{urllib.parse.urlencode(params)}"
        refreshed = False
        last: Exception | None = None
        attempt = 0
        # manual attempt accounting: the one-shot 401 refresh must NOT
        # consume an attempt, or a 401 on the final attempt would acquire
        # a fresh token and then raise without ever using it
        while attempt < self.retries:
            req = urllib.request.Request(
                url,
                headers={
                    "Authorization": f"bearer {self._token}",
                    "User-Agent": self.user_agent,
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as exc:
                last = exc
                if exc.code == 401 and not refreshed:
                    refreshed = True
                    self.connect()
                    continue
                if exc.code not in TRANSIENT_STATUSES:
                    raise
            except urllib.error.URLError as exc:
                last = exc
            attempt += 1
            if attempt < self.retries:
                self._sleep(self.retry_delay_s)
        raise RedditApiError(f"GET {path} failed after {self.retries} attempts") from last

    # -- listings ------------------------------------------------------

    def top(
        self,
        subreddit: str,
        time_filter: str = "week",  # reference default for the daily batch
        limit: int | None = 1000,  # extract-from-reddit.py:261
    ) -> Iterator[dict]:
        """Yield submission dicts from ``/r/{sub}/top``, paging via the
        listing ``after`` cursor — the iteration PRAW's ``ListingGenerator``
        performs. Each yielded dict is the raw ``child["data"]`` object,
        whose keys (id/title/score/.../subreddit) are exactly the 13
        ``POST_FIELDS`` the projection consumes."""
        after: str | None = None
        fetched = 0
        bound = limit if limit is not None else float("inf")
        while fetched < bound:
            params: dict = {"t": time_filter, "limit": int(min(PAGE_SIZE, bound - fetched)), "raw_json": 1}
            if after:
                params["after"] = after
            listing = self._get(f"/r/{subreddit}/top.json", params)
            children = listing.get("data", {}).get("children", [])
            if not children:
                return
            for child in children:
                yield child.get("data", {})
                fetched += 1
                if fetched >= bound:
                    return
            after = listing.get("data", {}).get("after")
            if not after:
                return

    def subreddit_top(
        self, subreddit: str, time_filter: str = "week", limit: int | None = 1000
    ) -> Callable[[], Iterator[dict]]:
        """Fetcher-callable adapter for ``fetch_posts_df`` — the same
        contract ``FakeRedditSource`` satisfies."""
        return lambda: self.top(subreddit, time_filter=time_filter, limit=limit)


def client_from_config(cfg) -> RedditHttpClient:
    """Build a client from a ``PipelineConfig`` (configuration.conf parity:
    the reference reads client_id/secret from the ``reddit_config``
    section, extract-from-reddit.py:21-32)."""
    if not cfg.client_id or not cfg.secret:
        raise ValueError("client_id/secret not configured ([reddit_config])")
    return RedditHttpClient(client_id=cfg.client_id, client_secret=cfg.secret)
