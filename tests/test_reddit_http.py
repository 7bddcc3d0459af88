"""RedditHttpClient against a localhost fake Reddit API server: the OAuth
token exchange, paginated /top listing, transient-failure retry, 401
token refresh, and the fetch_posts_df composition — the live-HTTP seam
the reference exercises via PRAW (extract-from-reddit.py:35-75), verified
end-to-end without outbound network."""

import base64
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.sources.reddit_api import fetch_posts_df  # noqa: E402
from reddit_etl_pipeline_spark.sources.reddit_http import (  # noqa: E402
    RedditApiError,
    RedditHttpClient,
)

CLIENT_ID, SECRET = "test_id", "test_secret"
N_POSTS = 150  # forces pagination: 2 pages at the API's 100-child cap


def _post(i: int) -> dict:
    return {
        "id": f"p{i:04d}",
        "title": f"Post {i}",
        "score": i * 3,
        "num_comments": i % 40,
        "author": None if i % 29 == 0 else f"user_{i % 7}",
        "created_utc": 1742169600.0 + i,
        "url": f"https://reddit.com/r/stocks/p{i:04d}",
        "upvote_ratio": 0.5 + (i % 50) / 100,
        "over_18": i % 23 == 0,
        "spoiler": False,
        "stickied": i < 2,
        "selftext": f"body {i}",
        "subreddit": "stocks",
    }


class FakeRedditHandler(BaseHTTPRequestHandler):
    state = {
        "tokens_issued": 0,
        "flaky_remaining": 0,  # next N listing GETs return 500
        "expire_token": False,  # next listing GET 401s once
        "seen_user_agents": [],
        "seen_listing_params": [],
    }

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st = self.state
        if urlparse(self.path).path != "/api/v1/access_token":
            return self._json(404, {})
        expected = base64.b64encode(f"{CLIENT_ID}:{SECRET}".encode()).decode()
        if self.headers.get("Authorization") != f"Basic {expected}":
            return self._json(401, {"message": "Unauthorized"})
        st["seen_user_agents"].append(self.headers.get("User-Agent"))
        st["tokens_issued"] += 1
        self._json(
            200,
            {"access_token": f"tok_{st['tokens_issued']}", "token_type": "bearer"},
        )

    def do_GET(self):
        st = self.state
        parsed = urlparse(self.path)
        if parsed.path != "/r/stocks/top.json":
            return self._json(404, {})
        if st["flaky_remaining"] > 0:
            st["flaky_remaining"] -= 1
            return self._json(500, {"message": "Internal Server Error"})
        auth = self.headers.get("Authorization", "")
        if st["expire_token"]:
            st["expire_token"] = False
            return self._json(401, {"message": "Unauthorized"})
        if not auth.startswith("bearer tok_"):
            return self._json(401, {"message": "Unauthorized"})
        params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        st["seen_listing_params"].append(params)
        st["seen_user_agents"].append(self.headers.get("User-Agent"))
        start = int(params["after"][1:].lstrip("p") or 0) + 1 if "after" in params else 0
        page = min(int(params.get("limit", 100)), 100, N_POSTS - start)
        children = [{"kind": "t3", "data": _post(i)} for i in range(start, start + page)]
        after = f"t{children[-1]['data']['id']}" if start + page < N_POSTS and children else None
        self._json(200, {"kind": "Listing", "data": {"children": children, "after": after}})


@pytest.fixture(scope="module")
def fake_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeRedditHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _client(base: str, **kw) -> RedditHttpClient:
    kw.setdefault("sleep", lambda s: None)  # no real waiting in tests
    return RedditHttpClient(
        CLIENT_ID,
        SECRET,
        token_url=f"{base}/api/v1/access_token",
        api_url=base,
        **kw,
    )


def _reset_state(**overrides):
    FakeRedditHandler.state.update(
        {
            "tokens_issued": 0,
            "flaky_remaining": 0,
            "expire_token": False,
            "seen_user_agents": [],
            "seen_listing_params": [],
        }
    )
    FakeRedditHandler.state.update(overrides)


def test_token_exchange_and_paginated_top(fake_server):
    _reset_state()
    posts = list(_client(fake_server).top("stocks", time_filter="week", limit=None))
    assert len(posts) == N_POSTS
    assert posts[0]["id"] == "p0000" and posts[-1]["id"] == f"p{N_POSTS - 1:04d}"
    st = FakeRedditHandler.state
    assert st["tokens_issued"] == 1
    # two listing pages: no cursor, then the after cursor from page 1
    assert len(st["seen_listing_params"]) == 2
    assert "after" not in st["seen_listing_params"][0]
    assert st["seen_listing_params"][1]["after"] == "tp0099"
    assert st["seen_listing_params"][0]["t"] == "week"
    assert all(ua == "Data Pipeline/1.0" for ua in st["seen_user_agents"])


def test_limit_caps_fetch_and_page_size(fake_server):
    _reset_state()
    posts = list(_client(fake_server).top("stocks", limit=30))
    assert len(posts) == 30
    assert FakeRedditHandler.state["seen_listing_params"][0]["limit"] == "30"


def test_transient_500_retries_then_succeeds(fake_server):
    _reset_state(flaky_remaining=2)
    posts = list(_client(fake_server).top("stocks", limit=5))
    assert len(posts) == 5  # 2 failures + success within the 3-try budget


def test_transient_500_exhausts_retries(fake_server):
    _reset_state(flaky_remaining=10)
    with pytest.raises(RedditApiError):
        list(_client(fake_server).top("stocks", limit=5))


def test_401_refreshes_token_once(fake_server):
    _reset_state()
    c = _client(fake_server)
    assert len(list(c.top("stocks", limit=5))) == 5
    FakeRedditHandler.state["expire_token"] = True
    assert len(list(c.top("stocks", limit=5))) == 5
    assert FakeRedditHandler.state["tokens_issued"] == 2  # refreshed exactly once


def test_bad_credentials_fail_connect(fake_server):
    _reset_state()
    bad = RedditHttpClient(
        "wrong",
        "creds",
        token_url=f"{fake_server}/api/v1/access_token",
        api_url=fake_server,
        sleep=lambda s: None,
    )
    with pytest.raises(ConnectionError):
        bad.connect()
    assert FakeRedditHandler.state["tokens_issued"] == 0


def test_fetch_posts_df_from_http_source(fake_server, spark):
    """The live client composes with the Spark materialization exactly like
    FakeRedditSource: 13-column RAW frame, author/bool normalization."""
    _reset_state()
    c = _client(fake_server)
    df = fetch_posts_df(spark, c.subreddit_top("stocks", limit=120))
    rows = df.collect()
    assert len(rows) == 120
    assert len(df.columns) == 13
    first = {r["id"]: r for r in rows}["p0000"]
    assert first["subreddit"] == "stocks"
    assert first["over_18"] == "True"  # bool -> warehouse text form
    assert first["stickied"] == "True"
    nulls = [r for r in rows if r["author"] is None]
    assert nulls  # deleted accounts stay null


def test_401_on_last_attempt_still_uses_fresh_token(fake_server):
    """The one-shot token refresh must not consume a retry attempt: with
    retries=1 an expired token is refreshed and the request still
    succeeds on the single budgeted attempt."""
    _reset_state()
    c = _client(fake_server, retries=1)
    assert len(list(c.top("stocks", limit=5))) == 5
    FakeRedditHandler.state["expire_token"] = True
    assert len(list(c.top("stocks", limit=5))) == 5
    assert FakeRedditHandler.state["tokens_issued"] == 2
