"""HTML-article UDTF: file -> N article rows via binaryFile + mapInPandas."""

from __future__ import annotations

from social_and_media_data_ingestion_spark.sources.html_articles import (
    parse_article_blocks,
    parse_articles,
)

FAZ_HTML = """
<html><body>
<div class="single-document" data-id="faz-1">
  <h2>Erster Titel</h2>
  <time>01.02.2021</time>
  <p>Absatz eins.</p><p>Absatz zwei.</p>
</div>
<div class="single-document" data-id="faz-2">
  <h2>Zweiter Titel</h2>
  <time>02.02.2021</time>
  <p>Inhalt.</p>
</div>
</body></html>
"""

EN_HTML = """
<div class="article enArticle" data-id="en-1">
  <h1>English Title</h1>
  <time>3. March 2021</time>
  <span class="author">Jane Doe</span>
  <p>Body text with spark keyword.</p>
</div>
"""


def test_parse_blocks_pure():
    rows = parse_article_blocks(FAZ_HTML, "faz", "f.html")
    assert [r["id"] for r in rows] == ["faz-1", "faz-2"]
    assert rows[0]["title"] == "Erster Titel"
    assert rows[0]["time"] == "01.02.2021"
    assert rows[0]["text"] == "Absatz eins.\nAbsatz zwei."
    en = parse_article_blocks(EN_HTML, "en_article", "e.html")
    assert en[0]["author"] == "Jane Doe"


def test_parse_articles_udtf(spark, tmp_path):
    for name, html in [("a.html", FAZ_HTML), ("b.html", FAZ_HTML)]:
        (tmp_path / name).write_text(html, encoding="utf-8")
    df = parse_articles(spark, str(tmp_path / "*.html"), "faz")
    rows = df.collect()
    assert len(rows) == 4  # 2 files x 2 articles
    assert {r.media for r in rows} == {"faz"}
    assert df.columns == ["title", "time", "author", "text", "meta", "id", "media"]


def test_unknown_dialect(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown dialect"):
        parse_articles(spark, "/tmp/nope/*.html", "unknown")
