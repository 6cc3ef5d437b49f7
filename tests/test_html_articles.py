"""HTML-article UDTF: file -> N article rows via binaryFile + mapInPandas.

Golden fixtures are shaped like the reference's REAL archived markup
(ref parser_media_articles.py:6-67): FAZ fields live in <pre> children
keyed by class; EN/DE articles use div#hd titles, last-<p> ids, <b>-tag
terms, and articleParagraph body spans.
"""

from __future__ import annotations

import pytest

from social_and_media_data_ingestion_spark.sources.html_articles import (
    parse_article_blocks,
    parse_articles,
)

# ref parser_media_articles.py:11-18 — pre children by class; meta is every
# pre whose first class is NOT in {text, docImage, docCopy}.
FAZ_HTML = """
<html><body>
<div class="single-document">
  <pre class="docTitle">Erster Titel</pre>
  <pre class="docSource">Frankfurter Allgemeine Zeitung, 01.02.2021, Nr. 26, S. 3</pre>
  <pre class="docAuthor">Von Max Mustermann</pre>
  <pre class="text">Absatz eins.
Absatz zwei mit https://example.com/x Link.</pre>
  <pre class="docImage">bild-1.jpg</pre>
  <pre class="docCopy">(c) F.A.Z.</pre>
</div>
<div class="single-document">
  <pre class="docTitle">Zweiter Titel</pre>
  <pre class="docSource">FAZ.NET, 15.12.2020</pre>
  <pre class="text">Inhalt zwei.</pre>
</div>
</body></html>
"""

# ref parser_media_articles.py:30-43 — div#hd title, last-<p> id, <b> terms,
# articleParagraph spans, German month names even in the EN corpus (dictde).
EN_HTML = """
<html><body>
<div class="article enArticle">
  <div id="hd">English Title</div>
  <div class="author">Jane Doe</div>
  <div class="leadParagraph">New York Times, 3 März 2021, Seite A1</div>
  <span class="articleParagraph enarticleParagraph">Body text with <b>conspiracy</b> keyword.</span>
  <span class="articleParagraph enarticleParagraph">Second paragraph mentions <b>deep state</b>.</span>
  <p>English Document</p>
  <p>Document NYT0000020210303abc123</p>
</div>
</body></html>
"""

DE_HTML = """
<html><body>
<div class="article deArticle">
  <div id="hd">Deutscher Titel</div>
  <div class="leadParagraph">Süddeutsche Zeitung, 7 Januar 2022</div>
  <span class="articleParagraph dearticleParagraph">Erster Absatz über <b>Verschwörung</b>.</span>
  <p>Dokument SZ0000020220107xyz789</p>
</div>
</body></html>
"""


def test_faz_reference_markup():
    rows = parse_article_blocks(FAZ_HTML, "faz", "f.html")
    assert len(rows) == 2
    r = rows[0]
    assert r["title"] == "Erster Titel"
    assert r["time"] == "2021-02-01"  # dd.mm.yyyy from docSource -> ISO
    assert r["text"].startswith("Absatz eins.")
    # meta = every pre whose first class not in {text, docImage, docCopy}
    assert r["meta"] == (
        "Erster Titel\n"
        "Frankfurter Allgemeine Zeitung, 01.02.2021, Nr. 26, S. 3\n"
        "Von Max Mustermann"
    )
    assert r["terms"] == []  # FAZ terms are keyword-side only (ref :87)
    assert rows[1]["time"] == "2020-12-15"
    assert rows[1]["meta"] == "Zweiter Titel\nFAZ.NET, 15.12.2020"


def test_en_reference_markup():
    rows = parse_article_blocks(EN_HTML, "en_article", "e.html")
    assert len(rows) == 1
    r = rows[0]
    assert r["title"] == "English Title"
    assert r["author"] == "Jane Doe"
    assert r["time"] == "2021-03-03"  # "3 März 2021" via German month map
    assert r["id"] == "Document NYT0000020210303abc123"  # LAST <p>
    assert r["terms"] == ["conspiracy", "deep state"]  # <b> tags, doc order
    assert r["text"] == (
        "Body text with conspiracy keyword.\nSecond paragraph mentions deep state."
    )
    # meta = newline-join of ALL div texts (hd + author + lead)
    assert "English Title" in r["meta"] and "Jane Doe" in r["meta"]


def test_de_reference_markup():
    rows = parse_article_blocks(DE_HTML, "de_article", "d.html")
    r = rows[0]
    assert r["title"] == "Deutscher Titel"
    assert r["time"] == "2022-01-07"
    assert r["id"] == "Dokument SZ0000020220107xyz789"
    assert r["terms"] == ["Verschwörung"]
    assert r["author"] == ""  # no div.author -> "" (ref :41)


def test_lenient_on_missing_structure():
    # reference would crash on a block missing docSource; engine emits ""
    html = '<div class="single-document"><pre class="docTitle">T</pre></div>'
    rows = parse_article_blocks(html, "faz", "x.html")
    assert rows[0]["time"] == "" and rows[0]["text"] == ""
    # unknown German month -> "" rather than KeyError
    bad = (
        '<div class="article enArticle"><div id="hd">T</div>'
        '<div>1 March 2021</div><p>id</p></div>'
    )
    assert parse_article_blocks(bad, "en_article", "x")[0]["time"] == ""


def test_parse_articles_udtf(spark, tmp_path):
    for name, html in [("a.html", FAZ_HTML), ("b.html", FAZ_HTML)]:
        (tmp_path / name).write_text(html, encoding="utf-8")
    df = parse_articles(spark, str(tmp_path / "*.html"), "faz")
    rows = df.collect()
    assert len(rows) == 4  # 2 files x 2 articles
    assert {r.media for r in rows} == {"faz"}
    assert df.columns == [
        "title", "time", "author", "text", "terms", "meta", "id", "media",
    ]


def test_parse_articles_udtf_terms(spark, tmp_path):
    (tmp_path / "e.html").write_text(EN_HTML, encoding="utf-8")
    df = parse_articles(spark, str(tmp_path / "*.html"), "en_article", media="nyt")
    row = df.collect()[0]
    assert row.terms == ["conspiracy", "deep state"]
    assert row.media == "nyt"


def test_unknown_dialect(spark):
    with pytest.raises(ValueError, match="unknown dialect"):
        parse_articles(spark, "/tmp/nope/*.html", "unknown")


def test_hostile_html_survival():
    """A 100 TB archive scan WILL hit pathological files; the parser
    must extract the valid article and never die on the garbage around
    it: 50k-deep nesting (the DOM walkers are iterative, no recursion
    limit), unclosed tags everywhere, mismatched closes, NUL bytes,
    a 100 KB attribute value, stray ampersands and broken entities."""
    deep = "<div>" * 50_000
    hostile = (
        "<html><body>"
        + deep  # never closed
        + "<p>trapped text</p>"
        + "</span></b></table>"  # closes for tags never opened
        + "\x00<pre class='docTitle'>"  # NUL + unclosed pre... then real doc:
        + f"<div class=x{'y' * 100_000}>&nope;&amp broken</div>"
        + FAZ_HTML
        + "<div class='single-document'><pre class='docTitle'>Tail"  # EOF mid-tag
    )
    rows = parse_article_blocks(hostile, "faz", "hostile.html")
    titles = [r["title"] for r in rows]
    # the two intact FAZ articles parse; the truncated tail block still
    # yields its title (lenient), nothing raises
    assert "Erster Titel" in titles and "Zweiter Titel" in titles
    assert all(isinstance(r["text"], str) for r in rows)


def test_hostile_html_udtf_batch(spark, tmp_path):
    """Same guarantee through the Spark mapInPandas surface: a batch
    mixing a hostile file with a clean one produces the clean file's
    rows plus whatever the hostile one salvages — never a task error."""
    (tmp_path / "bad.html").write_text(
        "<div>" * 10_000 + "\x00<b>junk", encoding="utf-8"
    )
    (tmp_path / "good.html").write_text(FAZ_HTML, encoding="utf-8")
    df = parse_articles(spark, str(tmp_path / "*.html"), "faz")
    titles = {r["title"] for r in df.collect()}
    assert {"Erster Titel", "Zweiter Titel"} <= titles
