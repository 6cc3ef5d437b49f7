"""Download sink: URL-shape filter, retry envelope, success/error split."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators.filters import is_image_url
from social_and_media_data_ingestion_spark.sinks.image_download import (
    download_images,
)

POSTS = [
    ("p1", "http://ex.com/a.jpg"),
    ("p2", "http://ex.com/b.PNG"),
    ("p3", "https://imgur.com/xyz"),
    ("p4", "http://ex.com/page.html"),
    ("p5", "http://ex.com/fail.gif"),
    ("p6", "http://ex.com/flaky.gif"),
]


def test_url_shape_filter(spark):
    df = spark.createDataFrame(POSTS, ["id", "url"])
    kept = {r.id for r in df.filter(is_image_url("url")).collect()}
    assert kept == {"p1", "p2", "p3", "p5", "p6"}


def test_download_split_and_retry(spark, tmp_path):
    df = spark.createDataFrame(POSTS, ["id", "url"]).filter(is_image_url("url"))
    attempts: dict[str, int] = {}

    def fake_fetch(url: str) -> bytes:
        n = attempts.get(url, 0) + 1
        attempts[url] = n
        if "fail" in url:
            raise OSError("boom")
        if "flaky" in url and n < 3:
            raise OSError("transient")
        return b"\xff\xd8bytes"

    out = str(tmp_path / "imgs")
    res = download_images(
        df.repartition(1),  # shared attempts dict needs one worker
        out,
        fetcher=fake_fetch,
        backoff_base_s=0,
        politeness_s=(0, 0),
    ).cache()
    ok = {r.id: r for r in res.filter(F.col("ok")).collect()}
    err = {r.id: r for r in res.filter(~F.col("ok")).collect()}
    assert set(ok) == {"p1", "p2", "p3", "p6"}
    assert set(err) == {"p5"}
    assert err["p5"].attempts == 3 and "boom" in err["p5"].error
    assert ok["p6"].attempts == 3  # flaky succeeded on 3rd try
    for r in ok.values():
        assert os.path.exists(r.path)
        with open(r.path, "rb") as f:
            assert f.read() == b"\xff\xd8bytes"


def test_permanent_fetch_error_skips_retry_envelope(spark, tmp_path):
    """A dead link (404-class) is the COMMON failure in a historical
    crawl; burning the full retry envelope on each one triples request
    volume for nothing. PermanentFetchError records the row in the
    error split after exactly ONE attempt, while transient errors keep
    the full retry behavior."""
    from social_and_media_data_ingestion_spark.sinks.image_download import (
        PermanentFetchError,
        download_images,
    )

    def fetcher(url: str) -> bytes:
        # per-URL attempt counting rides the sink's own `attempts`
        # column (the fetcher runs executor-side; driver dicts don't
        # come back) — flaky succeeds on its 3rd in-row attempt
        fetcher.calls = getattr(fetcher, "calls", 0) + 1
        if "gone" in url:
            raise PermanentFetchError(f"HTTP 404: {url}")
        if "flaky" in url:
            if fetcher.calls % 3 != 0:
                raise TimeoutError("transient")
            return b"ok"
        return b"ok"

    df = spark.createDataFrame(
        [("a", "http://x/gone.jpg"), ("b", "http://x/flaky.jpg")],
        ["id", "url"],
    )
    out = download_images(
        df,
        str(tmp_path),
        fetcher=fetcher,
        backoff_base_s=0,
        politeness_s=(0, 0),
    )
    rows = {r.id: r for r in out.collect()}
    assert rows["a"].ok is False and rows["a"].attempts == 1
    assert "PermanentFetchError" in rows["a"].error
    assert rows["b"].ok is True and rows["b"].attempts >= 2


def test_default_fetcher_408_425_are_transient(monkeypatch):
    """408 (request timeout) and 425 (too early) are server-side
    pushback a retry CAN cure — they must not be classified
    PermanentFetchError like 404/403, or a flaky CDN returning 408s
    gets zero retries. They raise the ordinary HTTPError instead,
    which download_images' retry envelope handles like 429/5xx."""
    import requests

    from social_and_media_data_ingestion_spark.sinks.image_download import (
        PermanentFetchError,
        default_fetcher,
    )

    class FakeResp:
        def __init__(self, status):
            self.status_code = status
            self.content = b"ok"

        def raise_for_status(self):
            if self.status_code >= 400:
                raise requests.exceptions.HTTPError(f"HTTP {self.status_code}")

    def fake_get(url, timeout=None):
        return FakeResp(int(url.rsplit("/", 1)[1]))

    monkeypatch.setattr(requests, "get", fake_get)
    for transient in (408, 425, 429):
        with pytest.raises(requests.exceptions.HTTPError):
            default_fetcher(f"http://x/{transient}")
    for permanent in (400, 403, 404, 410):
        with pytest.raises(PermanentFetchError):
            default_fetcher(f"http://x/{permanent}")
    assert default_fetcher("http://x/200") == b"ok"
