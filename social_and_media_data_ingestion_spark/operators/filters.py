"""Filter/predicate operators (SURVEY §2.3 F1, F4-F7)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMAGE_EXT_PATTERN = r"\.(jpg|jpeg|png|gif)$"


def semi_join_lowered(
    df: DataFrame, key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Set-membership filter as a broadcast LEFT SEMI join, comparing
    lowercased keys (ref reddit_subm_extraction.py:52-55; set built :23).
    Broadcast: dim is an allowlist — small by construction. Shuffle-free."""
    dim_prepped = (
        dim.select(F.lower(F.col(dim_key)).alias("__dim_key")).na.drop().distinct()
    )
    return df.join(
        F.broadcast(dim_prepped),
        F.lower(F.col(key)) == F.col("__dim_key"),
        "left_semi",
    )


def isin_lowered(col: Column | str, values: Sequence[str]) -> Column:
    """Literal-list spelling of the same predicate — for plan-time-known
    small dims. Catalyst compiles to an In/InSet expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).isin([v.lower() for v in values])


def date_range(col: Column | str, start, end) -> Column:
    """START <= col <= END (ref reddit_image_scraper.py:15-16,56-57)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.between(F.lit(start), F.lit(end))


def drop_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """dropna(subset=...) (ref reddit_image_scraper.py:58)."""
    return df.na.drop(subset=list(subset))


def is_image_url(col: Column | str) -> Column:
    """Lowercased URL ends with an image extension OR contains imgur.com
    (ref reddit_image_scraper.py:26-27)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return low.rlike(IMAGE_EXT_PATTERN) | low.contains("imgur.com")


def non_empty_array(col: Column | str) -> Column:
    """len(terms) > 0 (ref parser_media_articles.py:103,119)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(c) > 0
