"""Python Data Source: cursor-paginated REST as batch + streaming source."""

from __future__ import annotations

import json

import pytest

from social_and_media_data_ingestion_spark.sources.rest_datasource import (
    RestCursorDataSource,
)
from social_and_media_data_ingestion_spark.sources.tweets import flatten_tweets
from tests.test_tweets import make_page

PAGES = [
    make_page([1, 2], next_token="t1"),
    make_page([3, 4], next_token="t2"),
    make_page([5]),
]


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(RestCursorDataSource)
    return spark


def test_batch_read(registered):
    df = (
        registered.read.format("rest_cursor")
        .option("pages_json", json.dumps(PAGES))
        .load()
    )
    rows = df.collect()
    assert [r.page_index for r in sorted(rows, key=lambda r: r.page_index)] == [0, 1, 2]
    # downstream flatten: payload -> from_json -> exploded tweets
    from pyspark.sql import functions as F

    from social_and_media_data_ingestion_spark.schemas import TWEET_PAGE

    pages = df.select(F.from_json("payload", TWEET_PAGE).alias("page"))
    tweets = flatten_tweets(pages)
    assert {r.id for r in tweets.collect()} == {"1", "2", "3", "4", "5"}


def test_stream_read(registered, tmp_path):
    stream = (
        registered.readStream.format("rest_cursor")
        .option("pages_json", json.dumps(PAGES))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_pages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = registered.sql("SELECT page_index FROM rest_pages").collect()
    assert sorted(r.page_index for r in got) == [0, 1, 2]


def test_missing_options_error(registered):
    with pytest.raises(Exception, match="pages_json|url"):
        registered.read.format("rest_cursor").load().collect()


class _FakeResponse:
    def __init__(self, status_code, payload=None):
        self.status_code = status_code
        self._payload = payload or {}

    def raise_for_status(self):
        import requests

        if self.status_code >= 400:
            raise requests.exceptions.HTTPError(response=self)

    def json(self):
        return self._payload


def _page(data, token=None):
    page = {"data": data}
    if token:
        page["meta"] = {"next_token": token}
    return page


def test_cursor_stutter_terminates_without_duplicate_fetch(monkeypatch):
    """An API that re-issues the SAME next_token (stutter) must not spin
    the chain to max_pages fetching duplicates — the cycle guard stops
    at the first repeated token, so each page is fetched exactly once."""
    import json as _json

    import requests

    from social_and_media_data_ingestion_spark.sources.rest_datasource import (
        _fetch_chain,
    )

    calls = []

    def fake_get(url, params=None, timeout=None):
        calls.append(dict(params or {}))
        token = (params or {}).get("next_token")
        if token is None:
            return _FakeResponse(200, _page(["a"], token="T1"))
        return _FakeResponse(200, _page(["b"], token="T1"))  # stutter

    monkeypatch.setattr(requests, "get", fake_get)
    out = _fetch_chain({"url": "http://x", "max_pages": "50"})
    assert len(out) == 2  # first page + the T1 page, never a third
    assert len(calls) == 2
    assert [_json.loads(p)["data"] for p in out] == [["a"], ["b"]]


def test_cursor_aba_cycle_terminates(monkeypatch):
    import requests

    from social_and_media_data_ingestion_spark.sources.rest_datasource import (
        _fetch_chain,
    )

    def fake_get(url, params=None, timeout=None):
        token = (params or {}).get("next_token")
        nxt = {None: "A", "A": "B", "B": "A"}[token]  # A -> B -> A cycle
        return _FakeResponse(200, _page([token or "root"], token=nxt))

    monkeypatch.setattr(requests, "get", fake_get)
    out = _fetch_chain({"url": "http://x", "max_pages": "50"})
    assert len(out) == 3  # root, A, B — then B's next_token A is seen


def test_transient_errors_retry_permanent_fail_fast(monkeypatch):
    import pytest
    import requests

    from social_and_media_data_ingestion_spark.sources import rest_datasource

    # 429 twice then success: retried, no error escapes
    seq = [_FakeResponse(429), _FakeResponse(503), _FakeResponse(200, _page(["ok"]))]
    sleeps = []
    monkeypatch.setattr(requests, "get", lambda *a, **k: seq.pop(0))
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))
    resp = rest_datasource._get_with_retry("http://x", {}, retries=3)
    assert resp.json() == _page(["ok"])
    assert sleeps == [1, 2]  # exponential backoff between attempts

    # 404: permanent, raises immediately without retrying
    calls = []

    def fake_404(*a, **k):
        calls.append(1)
        return _FakeResponse(404)

    monkeypatch.setattr(requests, "get", fake_404)
    with pytest.raises(requests.exceptions.HTTPError):
        rest_datasource._get_with_retry("http://x", {}, retries=3)
    assert len(calls) == 1

    # exhausted retries re-raise the last transient error
    monkeypatch.setattr(requests, "get", lambda *a, **k: _FakeResponse(429))
    with pytest.raises(requests.exceptions.HTTPError):
        rest_datasource._get_with_retry("http://x", {}, retries=1)
