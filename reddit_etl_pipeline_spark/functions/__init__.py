from .pii import pii_counts, scrub_pii  # noqa: F401
from .text import (  # noqa: F401
    bpe_token_count,
    detect_language,
    fingerprint,
    quality_score,
    text_stats,
    tfidf_topk,
    token_count,
)
from .transforms import transform_posts  # noqa: F401
