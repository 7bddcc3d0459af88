"""Canonical schemas.

The reference declares the 16-column ``reddit`` relation twice in Redshift
DDL (reference ``airflow/extraction/s3_to_redshift.py:161-181`` main table,
``:184-203`` staging) and implicitly in the extraction field list
(``extract-from-reddit.py:208-212``). Here it is declared once and applied
explicitly — no ``inferSchema`` in the engine path.

Boolean-as-text note: the warehouse stores ``over_18``/``spoiler``/
``stickied``/``is_nsfw`` as ``varchar(10)`` holding ``'False'``/``'True'``.
We keep them as strings in the RAW/STAGED relations for byte-parity with the
reference's CSV round-trip, and provide ``as_booleans()`` for analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- 13 extraction fields (reference extract-from-reddit.py:208-212) ------
POST_FIELDS = [
    "id",
    "title",
    "score",
    "num_comments",
    "author",
    "created_utc",
    "url",
    "upvote_ratio",
    "over_18",
    "spoiler",
    "stickied",
    "selftext",
    "subreddit",
]

# --- RAW schema: API-shaped rows before transform --------------------------
# created_utc arrives as unix epoch seconds (double from the API).
RAW_POSTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("score", T.LongType(), True),
        T.StructField("num_comments", T.LongType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("created_utc", T.DoubleType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("upvote_ratio", T.DoubleType(), True),
        T.StructField("over_18", T.StringType(), True),
        T.StructField("spoiler", T.StringType(), True),
        T.StructField("stickied", T.StringType(), True),
        T.StructField("selftext", T.StringType(), True),
        T.StructField("subreddit", T.StringType(), True),
    ]
)

# --- STAGED schema: the authoritative 16-column warehouse relation --------
# (reference s3_to_redshift.py:161-181; SURVEY.md §1.2). LongType for the
# metrics gives 100 TB headroom over Redshift's int4.
REDDIT_POSTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("score", T.LongType(), True),
        T.StructField("num_comments", T.LongType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("created_utc", T.TimestampType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("upvote_ratio", T.DoubleType(), True),
        T.StructField("over_18", T.StringType(), True),
        T.StructField("spoiler", T.StringType(), True),
        T.StructField("stickied", T.StringType(), True),
        T.StructField("selftext", T.StringType(), True),
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("extraction_timestamp", T.TimestampType(), True),
        T.StructField("selftext_length", T.LongType(), True),
        T.StructField("is_nsfw", T.StringType(), True),
    ]
)

# varchar widths from the Redshift DDL (s3_to_redshift.py:161-181), used by
# the tolerant reader's TRUNCATECOLUMNS emulation.
VARCHAR_WIDTHS = {
    "id": 100,
    "title": 4000,
    "author": 100,
    "url": 2000,
    "over_18": 10,
    "spoiler": 10,
    "stickied": 10,
    "selftext": 65535,
    "subreddit": 100,
    "is_nsfw": 10,
}

BOOL_AS_TEXT_COLUMNS = ["over_18", "spoiler", "stickied", "is_nsfw"]


def as_booleans(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Cast boolean-as-text columns ('False'/'True', any casing) to boolean."""
    for c in columns or BOOL_AS_TEXT_COLUMNS:
        if c in df.columns:
            df = df.withColumn(c, F.lower(F.col(c)).cast(T.BooleanType()))
    return df


def empty_posts(spark) -> DataFrame:
    """Typed empty relation — the reference's empty-input guard
    (extract-from-reddit.py:106-108)."""
    return spark.createDataFrame([], REDDIT_POSTS_SCHEMA)
