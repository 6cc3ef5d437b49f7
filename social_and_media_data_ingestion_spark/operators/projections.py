"""Projection operators (SURVEY §2.3 P1-P5)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project_fields_defaulted(
    df: DataFrame, fields: Sequence[str], keep: Sequence[str] = ()
) -> DataFrame:
    """Fixed-field projection with missing->"" and string-cast — parity with
    `[str(obj.get(f, "")) for f in FIELDS]` (ref reddit_subm_extraction.py:88).
    Fields absent from the schema become empty-string columns. `keep` columns
    pass through untouched (e.g. an id column)."""
    cols = [F.col(k) for k in keep]
    for f_name in fields:
        if f_name in df.columns:
            cols.append(F.coalesce(F.col(f_name).cast("string"), F.lit("")).alias(f_name))
        else:
            cols.append(F.lit("").alias(f_name))
    return df.select(*cols)


def with_literal(df: DataFrame, name: str, value) -> DataFrame:
    """Literal column, e.g. media='faz' (ref parser_media_articles.py:86)."""
    return df.withColumn(name, F.lit(value))


def concat_title_text(title: Column | str, text: Column | str, strip_urls: bool = True) -> Column:
    """title + "\\n" + text with URL stripping
    (ref parser_media_articles.py:83,100-101)."""
    t = F.col(title) if isinstance(title, str) else title
    x = F.col(text) if isinstance(text, str) else text
    if strip_urls:
        t = F.regexp_replace(t, r"https?://\S+", "")
        x = F.regexp_replace(x, r"https?://\S+", "")
    return F.concat(F.coalesce(t, F.lit("")), F.lit("\n"), F.coalesce(x, F.lit("")))


def nested_array_head(col: Column | str, field: str, default: str = "") -> Column:
    """referenced_tweets[0].type with ""-default when the array is absent
    (ref tweet_download.py:37-40). try_element_at: ANSI-safe on empty."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_element_at(c, F.lit(1)).getField(field), F.lit(default))
