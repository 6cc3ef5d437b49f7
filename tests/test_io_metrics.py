"""IO round-trips + observe() scan metrics (SURVEY §2.5 A1, §2.2 K1)."""

from __future__ import annotations

import json

from social_and_media_data_ingestion_spark.io import (
    landing_to_parquet,
    read_csv_dim,
    read_ndjson,
    split_corrupt,
    write_csv,
)
from social_and_media_data_ingestion_spark.schemas import REDDIT_SUBMISSION
from social_and_media_data_ingestion_spark.sources.reddit import with_scan_metrics


def test_csv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b"), (2, 'quo"te')], ["id", "v"])
    out = str(tmp_path / "csv_out")
    write_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert {(int(r.id), r.v) for r in back.collect()} == {(1, "a,b"), (2, 'quo"te')}


def test_observe_scan_metrics(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [
        json.dumps({"title": "t", "subreddit": "s", "created_utc": 1}),
        "garbage{{{",
        json.dumps({"title": "t2", "subreddit": "s", "created_utc": 2}),
    ]
    p.write_text("\n".join(lines), encoding="utf-8")
    from pyspark.sql import Observation

    obs = Observation("m1")
    df = with_scan_metrics(read_ndjson(spark, str(p), REDDIT_SUBMISSION), obs)
    df.collect()  # materialize -> observation recorded
    assert obs.get == {"n_total": 3, "n_bad": 1}


def test_landing_to_parquet(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        json.dumps({"title": "t", "subreddit": "s", "created_utc": 1})
        + "\nbad-line\n",
        encoding="utf-8",
    )
    dst = str(tmp_path / "landed")
    landing_to_parquet(spark, str(p), REDDIT_SUBMISSION, dst)
    back = spark.read.parquet(dst)
    assert back.count() == 1
    assert "_corrupt_record" not in back.columns


def test_read_csv_dim(spark, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("subr\nDataEng\nml\n", encoding="utf-8")
    dim = read_csv_dim(spark, str(p))
    assert {r.subr for r in dim.collect()} == {"DataEng", "ml"}


def test_truncated_archive_default_fails_flag_skips(spark, tmp_path):
    """Codec-level corruption is a different failure class from bad
    LINES: the PERMISSIVE corrupt-record column can't catch a truncated
    .gz (the Hadoop codec throws mid-task and kills the scan — one bad
    file in a 100 TB landing = a dead job). Default stays fail-fast;
    ignore_corrupt_files=True salvages the intact file(s), keeps the
    bytes decoded before the corruption point, and finishes."""
    import gzip
    import json

    import pytest

    good_rows = [{"title": f"g{i}", "selftext": "s", "author": "u",
                  "subreddit": "a", "created_utc": str(1600000000 + i),
                  "permalink": f"/r/a/{i}"}
                 for i in range(5)]
    good = b"\n".join(json.dumps(r).encode() for r in good_rows)
    (tmp_path / "good.json.gz").write_bytes(gzip.compress(good))
    whole = gzip.compress(good * 20)
    (tmp_path / "trunc.json.gz").write_bytes(whole[: len(whole) // 2])

    with pytest.raises(Exception):
        read_ndjson(spark, str(tmp_path / "*.json.gz"), REDDIT_SUBMISSION).count()

    df = read_ndjson(
        spark,
        str(tmp_path / "*.json.gz"),
        REDDIT_SUBMISSION,
        ignore_corrupt_files=True,
    )
    titles = {r.title for r in df.select("title").collect()}
    assert {f"g{i}" for i in range(5)} <= titles  # the intact file survives
