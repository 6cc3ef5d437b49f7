"""Structured Streaming: file source -> watermark dedup / windowed agg ->
memory sink; checkpointed parquet append with availableNow drain."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from social_and_media_data_ingestion_spark.streaming.pipeline import (
    append_to_parquet,
    dedup_within_watermark,
    read_stream,
    run_to_memory,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _rows(minute_offsets_kinds):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        (rid, base + dt.timedelta(minutes=m), kind)
        for rid, m, kind in minute_offsets_kinds
    ]


def test_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        _rows([("a", 0, "x"), ("b", 1, "x"), ("c", 6, "y"), ("d", 7, "x")]),
    )
    stream = read_stream(spark, src, SCHEMA)
    agg = windowed_counts(stream, "ts", window="5 minutes", group_cols=["kind"])
    q = run_to_memory(agg, "win_counts", output_mode="complete")
    try:
        got = {
            (r.window_start.minute, r.kind): r.n
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got == {(0, "x"): 2, (5, "y"): 1, (5, "x"): 1}
    finally:
        q.stop()


def test_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        _rows([("a", 0, "x"), ("a", 0, "x"), ("b", 1, "x"), ("a", 0, "x")]),
    )
    stream = read_stream(spark, src, SCHEMA)
    dd = dedup_within_watermark(stream, "id", "ts")
    q = run_to_memory(dd, "dedup_stream")
    try:
        assert spark.sql("SELECT * FROM dedup_stream").count() == 2
    finally:
        q.stop()


def test_checkpointed_append_resume(spark, tmp_path):
    """T2/T4/T6: drain -> stop -> new data -> resume processes ONLY the new
    file (offsets from the checkpoint WAL), no duplicates."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_batch(spark, src, _rows([("a", 0, "x"), ("b", 1, "x")]))
    stream = read_stream(spark, src, SCHEMA)
    q = append_to_parquet(stream, out, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2

    _write_batch(spark, src, _rows([("c", 2, "y")]))
    q2 = append_to_parquet(read_stream(spark, src, SCHEMA), out, ckpt)
    q2.awaitTermination(60)
    got = {r.id for r in spark.read.parquet(out).collect()}
    assert got == {"a", "b", "c"}
    assert spark.read.parquet(out).count() == 3


def test_stream_static_enrich(spark, tmp_path):
    from social_and_media_data_ingestion_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    src = str(tmp_path / "src_enrich")
    _write_batch(
        spark, src, _rows([("a", 0, "click"), ("b", 1, "error"), ("c", 2, "view")])
    )
    dim = spark.createDataFrame(
        [("click", "engagement"), ("error", "ops")], ["kind", "category"]
    )
    stream = read_stream(spark, src, SCHEMA)
    enriched = stream_static_enrich(stream, dim, on=["kind"])
    q = run_to_memory(enriched, "enriched_out")
    try:
        rows = {
            r["id"]: r["category"]
            for r in spark.sql("SELECT * FROM enriched_out").collect()
        }
    finally:
        q.stop()
    assert rows == {"a": "engagement", "b": "ops", "c": None}
