"""Cursor-paginated REST API as a first-class Spark data source
(Python Data Source API, Spark 4) — the DSv2-style source SURVEY §7
called for, replacing the reference's hand-rolled while-loop
(tweet_download.py:62-104).

Usage:
    spark.dataSource.register(RestCursorDataSource)
    df = (spark.read.format("rest_cursor")
          .option("pages_json", json.dumps(pages))   # inline fixture mode
          .load())
    # or .option("url", "https://api...") with requests in live mode

Batch read: the planner walks the cursor chain driver-side to enumerate
page offsets (cheap: one request per page token — unavoidable for an
opaque-cursor API), then executors fetch/parse pages in parallel, one
InputPartition per page.

Streaming read: offsets are page indexes in the cursor chain; each
micro-batch drains the pages discovered since the last trigger, giving
checkpointed exactly-once page delivery (T1/T2/T6 in SURVEY §2.9).

Filter pushdown (F8 semantics — lang/time-range pushed INTO the API
query, tweet_download.py:74-75) is expressed by passing query options
(`query`, `start_time`, `end_time`) that become request parameters, i.e.
source-side predicate evaluation exactly like the reference.

The row schema is the raw page: one row per page (page_index, payload
JSON string). Downstream, sources.tweets.flatten_page explodes payloads
— keeping fetch (IO-bound) and parse (CPU-bound, Catalyst-optimizable)
separable stages.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

PAGE_SCHEMA = StructType(
    [
        StructField("page_index", IntegerType()),
        StructField("payload", StringType()),
    ]
)


def _get_with_retry(url: str, params: dict, retries: int = 3):
    """One page fetch with bounded retry + exponential backoff on the
    transient classes a paginated crawl WILL hit at production length —
    429 rate limits, 5xx, connection drops. Anything else (4xx auth,
    bad request) raises immediately: retrying a permanent error only
    delays the real message. Mirrors the image sink's per-row retry
    contract (`sinks/image_download.py`); without it a single 429 in a
    10k-page chain kills the whole batch-planning step."""
    import time

    import requests

    last_exc: Exception | None = None
    for attempt in range(retries + 1):
        try:
            resp = requests.get(url, params=params, timeout=30)
            resp.raise_for_status()
            return resp
        except requests.exceptions.HTTPError as e:
            status = getattr(e.response, "status_code", None)
            if status is not None and status != 429 and status < 500:
                raise  # permanent client error: fail fast
            last_exc = e
        except requests.exceptions.RequestException as e:
            last_exc = e  # connection/timeout: transient
        if attempt < retries:
            time.sleep(2**attempt)
    raise last_exc  # type: ignore[misc]


def _fetch_chain(options: dict) -> list[str]:
    """Walk the cursor chain, returning raw page payloads in order.

    Fixture mode: `pages_json` = JSON list of page dicts whose cursor
    chain is implicit in list order. Live mode: `url` + request params,
    following meta.next_token until exhausted (or `max_pages`).

    Cursor-cycle guard: an API that re-issues a next_token it already
    served (same-token stutter or an A→B→A cycle — real behavior on
    paginated APIs under concurrent writes) would otherwise spin the
    loop to max_pages fetching DUPLICATE pages; the chain terminates at
    the first repeated token instead, keeping every delivered page
    unique by construction."""
    if "pages_json" in options:
        return [json.dumps(p) for p in json.loads(options["pages_json"])]
    url = options.get("url")
    if not url:
        raise ValueError("rest_cursor requires option 'pages_json' or 'url'")
    params = {
        k: options[k]
        for k in ("query", "start_time", "end_time", "max_results")
        if k in options
    }
    max_pages = int(options.get("max_pages", 1000))
    retries = int(options.get("retries", 3))
    out: list[str] = []
    token = None
    seen_tokens: set[str] = set()
    for _ in range(max_pages):
        p = dict(params)
        if token:
            p["next_token"] = token
        resp = _get_with_retry(url, p, retries=retries)
        page = resp.json()
        out.append(json.dumps(page))
        token = (page.get("meta") or {}).get("next_token")
        if not token or not page.get("data"):
            break
        if token in seen_tokens:
            break  # cycle guard: never fetch a page twice
        seen_tokens.add(token)
    return out


class _PagePartition(InputPartition):
    def __init__(self, index: int, payload: str):
        self.index = index
        self.payload = payload


class RestCursorBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        return [
            _PagePartition(i, p) for i, p in enumerate(_fetch_chain(self.options))
        ]

    def read(self, partition: _PagePartition):
        yield (partition.index, partition.payload)


class RestCursorStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = number of pages consumed so far."""

    def __init__(self, options: dict):
        self.options = options
        self._chain: list[str] | None = None

    def _pages(self) -> list[str]:
        if self._chain is None:
            self._chain = _fetch_chain(self.options)
        return self._chain

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": len(self._pages())}

    def partitions(self, start, end):
        return [
            _PagePartition(i, self._pages()[i])
            for i in range(start["page"], end["page"])
        ]

    def read(self, partition: _PagePartition):
        yield (partition.index, partition.payload)

    def commit(self, end):
        pass


class RestCursorDataSource(DataSource):
    @classmethod
    def name(cls):
        return "rest_cursor"

    def schema(self):
        return PAGE_SCHEMA

    def reader(self, schema):
        return RestCursorBatchReader(self.options)

    def streamReader(self, schema):
        return RestCursorStreamReader(self.options)
