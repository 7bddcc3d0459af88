from .csv_tolerant import read_posts_csv, read_tolerant_csv  # noqa: F401
from .lake import read_table, write_table  # noqa: F401
from .reddit_api import FakeRedditSource, fetch_posts_df  # noqa: F401
