"""Per-row binary HTTP fetch sink with retry/backoff/politeness and a
success/error split (SURVEY §2.1 S7, §2.2 K4/K6; ref
reddit_image_scraper.py:17-18,29-52,66-69).

Spark shape: filter to image-shaped URLs (operators.filters.is_image_url),
`repartition(n)` to bound HTTP concurrency (n partitions == n concurrent
clients — the deliberate-politeness analog of the reference's single
process + random sleep), then `mapInPandas` performing the fetch and
returning a status row per input: success rows carry the output path,
failures carry (failed_url, error_type) — the reference's error log as a
first-class DataFrame instead of a pickle.

The HTTP layer is injectable (`fetcher`) so tests run without network;
the default uses `requests` with the reference's retry envelope:
3 attempts, 2**attempt backoff, uniform(1,6)s politeness sleep.
"""

from __future__ import annotations

import os
import random
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

Fetcher = Callable[[str], bytes]
"""fetch(url) -> content bytes; raise on failure. Raise
PermanentFetchError for failures a retry cannot cure (4xx other than
429) — the sink records them after ONE attempt instead of burning the
full retry envelope. At archive scale dead links are the COMMON error
(millions of 404s in a historical crawl), so retrying them triples the
request volume and adds two backoff sleeps per dead row for nothing."""


class PermanentFetchError(Exception):
    """A fetch failure that retrying cannot cure (e.g. HTTP 404/403)."""

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("path", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
    ]
)


def default_fetcher(url: str) -> bytes:
    import requests

    resp = requests.get(url, timeout=30)
    # Permanent = a retry cannot cure it. 4xx generally qualifies, but
    # 408 (request timeout), 425 (too early), and 429 (rate limit) are
    # transient server-side pushback — they fall through to the retried
    # path with backoff like 5xx.
    if (
        400 <= resp.status_code < 500
        and resp.status_code not in (408, 425, 429)
    ):
        raise PermanentFetchError(f"HTTP {resp.status_code}: {url}")
    resp.raise_for_status()
    return resp.content


def download_images(
    df: DataFrame,
    out_dir: str,
    id_col: str = "id",
    url_col: str = "url",
    fetcher: Fetcher | None = None,
    max_retries: int = 3,
    backoff_base_s: float = 2.0,
    politeness_s: tuple[float, float] = (1.0, 6.0),
    concurrency: int | None = None,
) -> DataFrame:
    """Returns the per-row result table (ok/path or error). Split it with
    `results.filter("ok")` / `results.filter("NOT ok")` for the K6
    side-error output. Writes files to {out_dir}/{id}.jpg."""
    fetch = fetcher or default_fetcher
    if concurrency is not None:
        df = df.repartition(concurrency)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for rid, url in zip(pdf[id_col], pdf[url_col]):
                attempt, err, content = 0, None, None
                while attempt < max_retries:
                    attempt += 1
                    try:
                        content = fetch(url)
                        err = None
                        break
                    except PermanentFetchError as e:
                        err = f"{type(e).__name__}: {e}"
                        break  # no retry can cure a 404; record and move on
                    except Exception as e:  # noqa: BLE001 - error-split sink
                        err = f"{type(e).__name__}: {e}"
                        if attempt < max_retries and backoff_base_s > 0:
                            time.sleep(backoff_base_s**attempt)
                if politeness_s != (0, 0):
                    time.sleep(random.uniform(*politeness_s))
                if content is not None:
                    path = os.path.join(out_dir, f"{rid}.jpg")
                    with open(path, "wb") as f:
                        f.write(content)
                    rows.append((str(rid), url, True, path, None, attempt))
                else:
                    rows.append((str(rid), url, False, None, err, attempt))
            yield pd.DataFrame(
                rows, columns=["id", "url", "ok", "path", "error", "attempts"]
            )

    return df.mapInPandas(_run, RESULT_SCHEMA)
