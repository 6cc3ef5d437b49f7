"""Tweet-page flattening + cursor-paginated ingestion with checkpoint
resume (SURVEY §5 item 4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators.dedup import keep_latest
from social_and_media_data_ingestion_spark.sources.tweets import (
    CursorCheckpoint,
    flatten_page,
    ingest_cursor_paginated,
    parse_pages,
)


def make_page(ids, next_token=None, users=None):
    return {
        "data": [
            {
                "id": str(i),
                "created_at": f"2022-01-01T00:00:{i % 60:02d}.000Z",
                "author_id": f"u{i % 3}",
                "text": f"tweet {i}",
                **(
                    {"referenced_tweets": [{"type": "retweeted", "id": str(i - 1)}]}
                    if i % 2 == 0
                    else {}
                ),
            }
            for i in ids
        ],
        "includes": {
            "users": users or [{"id": f"u{i % 3}", "username": f"name{i}"} for i in ids]
        },
        "meta": ({"next_token": next_token} if next_token else {}),
    }


def test_flatten_page(spark):
    page = make_page([1, 2], next_token="tok1")
    tweets, users = flatten_page(parse_pages(spark, [json.dumps(page)]))
    tw = {r.id: r for r in tweets.collect()}
    assert set(tw) == {"1", "2"}
    # nested head default: odd id has no referenced_tweets -> ""
    assert tw["1"].ref_type == "" and tw["1"].ref_id == ""
    assert tw["2"].ref_type == "retweeted" and tw["2"].ref_id == "1"
    assert tw["1"].time is not None
    assert users.count() == 2


def test_user_last_wins(spark):
    pages = [
        json.dumps(make_page([1], users=[{"id": "u1", "username": "old"}])),
        json.dumps(make_page([2], users=[{"id": "u1", "username": "new"}])),
    ]
    df = parse_pages(spark, pages)
    users = flatten_page(df)[1].withColumn("page", F.monotonically_increasing_id())
    latest = keep_latest(users, "id", "page", "username")
    assert [r.username for r in latest.collect()] == ["new"]


def test_cursor_ingest_and_resume(spark, tmp_path):
    pages = {
        None: make_page([1, 2], next_token="t1"),
        "t1": make_page([3, 4], next_token="t2"),
        "t2": make_page([5], next_token=None),
    }
    calls = []

    def fetch(token):
        calls.append(token)
        return pages[token]

    ckpt = CursorCheckpoint(str(tmp_path / "ckpt.jsonl"))
    out = str(tmp_path / "out")
    # ingest first two pages only
    list(ingest_cursor_paginated(spark, fetch, ckpt, out, max_pages=2))
    assert calls == [None, "t1"]
    assert ckpt.last()["next_token"] == "t2"
    # resume: picks up from t2, drains, and records exhaustion
    list(ingest_cursor_paginated(spark, fetch, ckpt, out))
    assert calls == [None, "t1", "t2"]
    assert ckpt.last()["next_token"] is None
    ids = {r.id for r in spark.read.parquet(f"{out}/tweets").collect()}
    assert ids == {"1", "2", "3", "4", "5"}
    # re-run after drain: no new fetches (exactly-once per cursor)
    list(ingest_cursor_paginated(spark, fetch, ckpt, out))
    assert calls == [None, "t1", "t2"]


def test_cursor_stutter_terminates_exactly_once(spark, tmp_path):
    """A wedged cursor (the API re-issues a token this run already
    fetched) must not loop forever under the default max_pages=None
    nor double-append: the run stops at the first repeated token,
    every page lands exactly once, and the checkpoint records a
    drained cursor so a resume does not re-enter the cycle."""
    pages = {
        None: make_page([1, 2], next_token="t1"),
        "t1": make_page([3, 4], next_token="t1"),  # stutter: t1 -> t1
    }
    calls = []

    def fetch(token):
        calls.append(token)
        return pages[token]

    ckpt = CursorCheckpoint(str(tmp_path / "ckpt.jsonl"))
    out = str(tmp_path / "out")
    batches = list(ingest_cursor_paginated(spark, fetch, ckpt, out))
    assert calls == [None, "t1"]  # the t1 page is fetched exactly once
    assert len(batches) == 2  # both pages delivered
    last = ckpt.last()
    assert last["next_token"] is None  # no resume re-enters the cycle
    # ...but distinguishably from a CLEAN drain: the wedged termination
    # is recorded so operators can tell the two outcomes apart
    assert last["reason"] == "wedged_cursor"
    ids = sorted(
        r.id for r in spark.read.parquet(f"{out}/tweets").collect()
    )
    assert ids == ["1", "2", "3", "4"]  # no duplicate appends
    # resume after the wedge: nothing to do, no fetches
    list(ingest_cursor_paginated(spark, fetch, ckpt, out))
    assert calls == [None, "t1"]
