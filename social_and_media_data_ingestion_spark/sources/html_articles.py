"""HTML media-article scan: the engine's file->rows UDTF surface
(SURVEY §2.1 S4; ref parser_media_articles.py:6-67 — three outlet
dialects, one row per article block).

Spark shape: `binaryFile` scan (1 row per file) -> `mapInPandas` parser
(Arrow-batched; the only Python-boundary crossing in the pipeline) ->
ARTICLE-schema rows. Outlet/dialect comes from the caller; `media`
column is stamped per ref parser_media_articles.py:86,96,111.

BeautifulSoup is gated behind an import-try (not installed in this
container); the fallback is a deterministic regex block parser that
understands the same structural conventions (block marked by a CSS
class, <h*> title, <time> tag, author span, <p> body). The dialect
table mirrors the reference's three parsers:
- 'faz':        blocks div class "single-document"  (ref :6-19)
- 'en_article': blocks div class "article enArticle" (ref :21-43)
- 'de_article': blocks div class "article deArticle" (ref :45-67)
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from social_and_media_data_ingestion_spark.schemas import ARTICLE

try:  # pragma: no cover - bs4 not present in this container
    from bs4 import BeautifulSoup  # noqa: F401

    _HAS_BS4 = True
except ImportError:
    _HAS_BS4 = False

DIALECTS = {
    "faz": {"block_class": "single-document"},
    "en_article": {"block_class": "enArticle"},
    "de_article": {"block_class": "deArticle"},
}

_TAG_RE = re.compile(r"<[^>]+>")


def _strip_tags(html: str) -> str:
    return _TAG_RE.sub("", html).strip()


def _blocks(html: str, block_class: str) -> list[str]:
    """Split on opening divs carrying the dialect's class. Regex fallback
    good enough for archived-article markup: blocks are top-level sibling
    divs, so splitting on the class marker isolates each article."""
    marker = re.compile(
        r"<div[^>]*class=\"[^\"]*" + re.escape(block_class) + r"[^\"]*\"[^>]*>"
    )
    starts = [m.start() for m in marker.finditer(html)]
    if not starts:
        return []
    starts.append(len(html))
    return [html[starts[i] : starts[i + 1]] for i in range(len(starts) - 1)]


def _first(pattern: str, block: str) -> str:
    m = re.search(pattern, block, re.DOTALL | re.IGNORECASE)
    return _strip_tags(m.group(1)).strip() if m else ""


def parse_article_blocks(html: str, dialect: str, source_name: str) -> list[dict]:
    """One dict per article block. Pure function — unit-testable without
    Spark, reused inside the mapInPandas UDTF."""
    spec = DIALECTS[dialect]
    out = []
    for block in _blocks(html, spec["block_class"]):
        title = _first(r"<h\d[^>]*>(.*?)</h\d>", block)
        time_s = _first(r"<time[^>]*>(.*?)</time>", block)
        author = _first(r"<span[^>]*class=\"[^\"]*author[^\"]*\"[^>]*>(.*?)</span>", block)
        paras = re.findall(r"<p[^>]*>(.*?)</p>", block, re.DOTALL | re.IGNORECASE)
        text = "\n".join(_strip_tags(p) for p in paras).strip()
        m_id = re.search(r"data-id=\"([^\"]+)\"", block)
        out.append(
            {
                "title": title,
                "time": time_s,
                "author": author,
                "text": text,
                "meta": source_name,
                "id": m_id.group(1) if m_id else "",
                "media": dialect,
            }
        )
    return out


def parse_articles(
    spark: SparkSession, glob: str, dialect: str, media: str | None = None
) -> DataFrame:
    """binaryFile scan -> mapInPandas UDTF -> ARTICLE rows.

    Scale: parallelism = file count (binaryFile rows partition freely);
    each Arrow batch carries whole files, parsed vectorized per batch.
    """
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {sorted(DIALECTS)}")
    media_name = media or dialect
    files = spark.read.format("binaryFile").load(glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                html = bytes(content).decode("utf-8", errors="replace")
                for rec in parse_article_blocks(html, dialect, path):
                    rec["media"] = media_name
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARTICLE.fields]
            ) if rows else pd.DataFrame(columns=[f.name for f in ARTICLE.fields])

    return files.select("path", "content").mapInPandas(_parse, ARTICLE)
