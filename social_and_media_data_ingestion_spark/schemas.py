"""Explicit StructTypes for every input shape the engine ingests.

Production paths never use schema inference — explicit schemas give
Catalyst JSON schema pruning (only requested fields are parsed) and
stable output contracts.

Reference shapes (cited for parity, NOT copied):
- Reddit submissions FIELDS: reddit_subm_extraction.py:10
- Reddit comments FIELDS:    reddit_comm_extraction.py:10
- Tweet page JSON:           tweet_download.py:32-53
- Image-post CSV:            reddit_image_scraper.py:55-60
"""

from __future__ import annotations

from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# --- Reddit submissions (NDJSON inside .zst) -------------------------------
# Input-tolerant: unknown keys ignored by schema projection; `created_utc`
# may arrive as string digits (cast later); missing fields -> null -> "".
REDDIT_SUBMISSION_FIELDS = [
    "title",
    "selftext",
    "author",
    "subreddit",
    "created_utc",
    "permalink",
]
REDDIT_SUBMISSION = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("selftext", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("created_utc", T.StringType()),  # tolerant; cast downstream
        T.StructField("permalink", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

# --- Reddit comments --------------------------------------------------------
REDDIT_COMMENT_FIELDS = [
    "body",
    "author",
    "subreddit",
    "created_utc",
    "id",
    "link_id",
    "parent_id",
]
REDDIT_COMMENT = T.StructType(
    [
        T.StructField("body", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("created_utc", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("link_id", T.StringType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

# --- Twitter v2 search page (one JSON document per page) --------------------
TWEET_PAGE = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("created_at", T.StringType()),
                        T.StructField("author_id", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField(
                            "referenced_tweets",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("type", T.StringType()),
                                        T.StructField("id", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "includes",
            T.StructType(
                [
                    T.StructField(
                        "users",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("username", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "meta",
            T.StructType([T.StructField("next_token", T.StringType())]),
        ),
    ]
)

# Flattened tweet table (ref tweet_download.py:56)
TWEET_FLAT = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("id", T.StringType()),
        T.StructField("author_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ref_type", T.StringType()),
        T.StructField("ref_id", T.StringType()),
    ]
)
TWEET_USER = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("username", T.StringType()),
    ]
)

# --- Image-post CSV (ref reddit_image_scraper.py:55-60) ---------------------
IMAGE_POST = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("created", T.StringType()),  # lenient parse downstream
    ]
)

# --- Parsed media article (ref parser_media_articles.py:43,67,69-70) --------
# `terms` is the markup-side keyword channel (<b> tags, ref :40,64).
ARTICLE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("meta", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("media", T.StringType()),
    ]
)

# --- Dimension tables --------------------------------------------------------
SUBREDDIT_DIM = T.StructType([T.StructField("subr", T.StringType())])
KEYWORD_DIM = T.StructType([T.StructField("keyword", T.StringType())])
