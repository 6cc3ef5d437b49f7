"""Datetime scalar functions (SURVEY §2.7).

German month-name handling uses an explicit literal map rather than
locale-dependent `to_date(..., 'd MMMM yyyy')` — the JVM default locale
is English, so the map is the deterministic choice (ref
parser_media_articles.py:25-26 keeps an explicit dict for the same
reason).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

GERMAN_MONTHS = {
    "Januar": "01",
    "Februar": "02",
    "März": "03",
    "April": "04",
    "Mai": "05",
    "Juni": "06",
    "Juli": "07",
    "August": "08",
    "September": "09",
    "Oktober": "10",
    "November": "11",
    "Dezember": "12",
}

def _german_month_map() -> Column:
    # built lazily: F.lit needs an active SparkSession
    return F.create_map(
        *[F.lit(x) for x in chain.from_iterable(GERMAN_MONTHS.items())]
    )


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def epoch_to_timestamp(col: Column | str) -> Column:
    """Epoch seconds (long OR string digits) -> UTC timestamp
    (ref reddit_subm_extraction.py:85 int(...) tolerance)."""
    return F.timestamp_seconds(_c(col).try_cast("long"))


def lenient_timestamp(col: Column | str) -> Column:
    """String -> timestamp, null on failure (pandas errors='coerce' parity,
    ref reddit_image_scraper.py:56)."""
    return F.try_to_timestamp(_c(col))


def dotted_date_to_iso(col: Column | str) -> Column:
    """'dd.mm.yyyy' -> 'yyyy-mm-dd' via backref regexp_replace
    (ref parser_media_articles.py:15, Java backref syntax $n)."""
    return F.regexp_replace(
        _c(col), r"(\d{2})\.(\d{2})\.(\d{4})", "$3-$2-$1"
    )


def german_date_to_iso(col: Column | str) -> Column:
    """'7. März 2021' -> '2021-03-07': regex split + explicit month map +
    zero-padded day (ref parser_media_articles.py:35-38,59-62)."""
    c = _c(col)
    day = F.lpad(F.regexp_extract(c, r"^(\d{1,2})\.", 1), 2, "0")
    month_name = F.regexp_extract(c, r"^\d{1,2}\.\s*(\S+)\s+\d{4}", 1)
    year = F.regexp_extract(c, r"(\d{4})\s*$", 1)
    month = F.element_at(_german_month_map(), month_name)
    return F.when(
        (day != "00") & month.isNotNull() & (year != ""),
        F.concat_ws("-", year, month, day),
    )


def strip_urls(col: Column | str) -> Column:
    """Remove http(s) URLs (ref parser_media_articles.py:83)."""
    return F.regexp_replace(_c(col), r"https?://\S+", "")
