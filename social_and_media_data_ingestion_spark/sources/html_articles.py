"""HTML media-article scan: the engine's file->rows UDTF surface
(SURVEY §2.1 S4; ref parser_media_articles.py:6-67 — three outlet
dialects, one row per article block).

Spark shape: `binaryFile` scan (1 row per file) -> `mapInPandas` parser
(Arrow-batched; the only Python-boundary crossing in the pipeline) ->
ARTICLE-schema rows. Outlet/dialect comes from the caller; `media`
column is stamped per ref parser_media_articles.py:86,96,111.

The parser is a small DOM built on the stdlib ``html.parser.HTMLParser``
(the same backend BeautifulSoup defaults to), so no third-party HTML
dependency is needed and the per-dialect extraction rules mirror the
reference exactly:

- 'faz' (ref parser_media_articles.py:6-19): blocks are
  ``div.single-document``; title from ``pre.docTitle``; date is the
  first ``dd.mm.yyyy`` inside ``pre.docSource`` rewritten to
  ``yyyy-mm-dd``; body from ``pre.text``; meta is the text of every
  ``<pre>`` child whose first class is NOT in
  {"text", "docImage", "docCopy"}, newline-joined.
- 'en_article' (ref :21-43): blocks ``.article.enArticle``; title from
  ``div#hd``; id = text of the LAST ``<p>``; meta = newline-join of all
  ``<div>`` texts; date = first ``d Month yyyy`` in meta with the
  German month-name map and zero-padded day; body = newline-join of
  ``.articleParagraph.enarticleParagraph`` texts; ``terms`` = text of
  every ``<b>`` tag; author from ``div.author`` or "".
- 'de_article' (ref :45-67): as 'en_article' with
  ``.article.deArticle`` blocks and ``.dearticleParagraph`` body spans.

Missing-structure behavior is lenient where the reference would raise
(absent docTitle/docSource/date -> empty string), since archived corpora
always contain stragglers and a 100 TB scan must not die on one file.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from social_and_media_data_ingestion_spark.schemas import ARTICLE

DIALECTS = ("faz", "en_article", "de_article")

# ref parser_media_articles.py:25-26 — explicit month map (JVM/locale-free)
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

_FAZ_META_EXCLUDE = {"text", "docImage", "docCopy"}  # ref :12
_DOTTED_DATE = re.compile(r"\d{2}.\d{2}.\d{4}")  # ref :14 (dot = any char, as written)
_DAY_MONTH_YEAR = re.compile(r"(\d{1,2})\s(\w+)\s(\d{4})")  # ref :35,59

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    """Minimal DOM node: tag, attrs, ordered children (nodes or text)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node | str] = []

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    @property
    def text(self) -> str:
        """Concatenated descendant text, document order, no separators
        (BeautifulSoup ``.text`` semantics)."""
        parts: list[str] = []
        stack: list[_Node | str] = list(reversed(self.children))
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                parts.append(item)
            else:
                stack.extend(reversed(item.children))
        return "".join(parts)

    def find_all(
        self,
        tag: str | None = None,
        class_: str | list[str] | None = None,
        id_: str | None = None,
    ) -> list["_Node"]:
        """All descendants (not self) matching tag AND every class token
        AND id, in document order."""
        want = (
            class_.split() if isinstance(class_, str) else list(class_ or [])
        )
        out: list[_Node] = []
        stack: list[_Node] = [c for c in reversed(self.children) if isinstance(c, _Node)]
        while stack:
            node = stack.pop()
            if (
                (tag is None or node.tag == tag)
                and all(w in node.classes for w in want)
                and (id_ is None or node.attrs.get("id") == id_)
            ):
                out.append(node)
            stack.extend(c for c in reversed(node.children) if isinstance(c, _Node))
        return out

    def find(
        self,
        tag: str | None = None,
        class_: str | list[str] | None = None,
        id_: str | None = None,
    ) -> "_Node | None":
        found = self.find_all(tag, class_, id_)
        return found[0] if found else None


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        # best-effort recovery on mis-nested markup: pop to nearest match
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_dom(html: str) -> _Node:
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


def _faz_rows(root: _Node) -> list[dict]:
    """ref parser_media_articles.py:11-18."""
    rows = []
    for e in root.find_all("div", class_="single-document"):
        meta = "\n".join(
            pre.text
            for pre in e.find_all("pre")
            if (pre.classes[0] if pre.classes else "") not in _FAZ_META_EXCLUDE
        )
        src = e.find("pre", class_="docSource")
        m = _DOTTED_DATE.findall(src.text) if src is not None else []
        time_s = (
            re.sub(r"(\d{2}).(\d{2}).(\d{4})", r"\3-\2-\1", m[0]) if m else ""
        )
        title = e.find("pre", class_="docTitle")
        body = e.find("pre", class_="text")
        rows.append(
            {
                "title": title.text if title is not None else "",
                "time": time_s,
                "author": "",
                "text": body.text if body is not None else "",
                "terms": [],  # FAZ terms come keyword-side only (ref :87)
                "meta": meta,
                "id": "",
            }
        )
    return rows


def _article_rows(root: _Node, block_class: str, para_class: str) -> list[dict]:
    """ref parser_media_articles.py:30-43 (en) / :54-66 (de)."""
    rows = []
    for e in root.find_all(class_=["article", block_class]):
        hd = e.find("div", id_="hd")
        paras = e.find_all("p")
        meta = "\n".join(d.text for d in e.find_all("div"))
        m = _DAY_MONTH_YEAR.findall(meta)
        time_s = ""
        if m:
            day, month, year = m[0]
            mm = GERMAN_MONTHS.get(month)
            if mm:
                time_s = f"{year}-{mm}-{int(day):02d}"
        body = "\n".join(
            p.text for p in e.find_all(class_=["articleParagraph", para_class])
        )
        author = e.find("div", class_="author")
        rows.append(
            {
                "title": hd.text if hd is not None else "",
                "time": time_s,
                "author": author.text if author is not None else "",
                "text": body,
                "terms": [b.text for b in e.find_all("b")],
                "meta": meta,
                "id": paras[-1].text if paras else "",
            }
        )
    return rows


def parse_article_blocks(html: str, dialect: str, source_name: str) -> list[dict]:
    """One dict per article block. Pure function — unit-testable without
    Spark, reused inside the mapInPandas UDTF. ``source_name`` lands in
    ``media`` by default (overridden by parse_articles' media arg)."""
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {sorted(DIALECTS)}")
    root = parse_dom(html)
    if dialect == "faz":
        rows = _faz_rows(root)
    elif dialect == "en_article":
        rows = _article_rows(root, "enArticle", "enarticleParagraph")
    else:
        rows = _article_rows(root, "deArticle", "dearticleParagraph")
    for r in rows:
        r["media"] = source_name
    return rows


def parse_articles(
    spark: SparkSession, glob: str, dialect: str, media: str | None = None
) -> DataFrame:
    """binaryFile scan -> mapInPandas UDTF -> ARTICLE rows.

    Scale: parallelism = file count (binaryFile rows partition freely);
    each Arrow batch carries whole files, parsed per batch. No shuffle.
    """
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {sorted(DIALECTS)}")
    media_name = media or dialect
    files = spark.read.format("binaryFile").load(glob)
    cols = [f.name for f in ARTICLE.fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                html = bytes(content).decode("utf-8", errors="replace")
                for rec in parse_article_blocks(html, dialect, path):
                    rec["media"] = media_name
                    rows.append(rec)
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame(columns=cols)
            )

    return files.select("path", "content").mapInPandas(_parse, ARTICLE)
