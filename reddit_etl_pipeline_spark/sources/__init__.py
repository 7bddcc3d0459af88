from .csv_tolerant import read_posts_csv, read_tolerant_csv, write_posts_csv  # noqa: F401
from .jsonl import read_tolerant_jsonl, write_jsonl  # noqa: F401
from .lake import read_table, write_table  # noqa: F401
from .reddit_api import FakeRedditSource, fetch_posts_df  # noqa: F401
from .reddit_http import RedditHttpClient, client_from_config  # noqa: F401
