from .models import MODELS, Model, run_models  # noqa: F401
from .queries import (  # noqa: F401
    hourly_avg_score,
    reddit_summary,
    stg_reddit,
    subreddit_stats,
    top_posts,
)
