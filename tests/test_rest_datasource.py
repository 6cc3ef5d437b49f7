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
