"""applyInPandasWithState: running totals persist across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from social_and_media_data_ingestion_spark.streaming.stateful import running_totals

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def feed(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    feed([("a", 1.0), ("a", 2.0), ("b", 10.0)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = running_totals(stream, "key", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.key: (r.n_total, r.sum_value)
            for r in spark.sql("SELECT * FROM running").collect()
        }
        assert got == {"a": (2, 3.0), "b": (1, 10.0)}

        feed([("a", 4.0), ("c", 7.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running").collect()
        latest = {}
        for r in rows:  # memory sink appends update rows; keep last per key
            latest[r.key] = (r.n_total, r.sum_value)
        # state carried: a accumulated across batches
        assert latest["a"] == (3, 7.0)
        assert latest["c"] == (1, 7.0)
    finally:
        q.stop()


def test_threshold_alerts_batch_split_invariant(spark, tmp_path):
    from social_and_media_data_ingestion_spark.streaming.stateful import (
        threshold_alerts,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "alert_src")
    ckpt = str(tmp_path / "alert_ckpt")

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # user 1 crosses $20 twice (threshold 1000 cents), user 2 never
    feed([(1, 6.0), (2, 3.0)])
    feed([(1, 5.0)])  # 1 -> 11.00: crosses level 1
    feed([(1, 10.0), (2, 4.0)])  # 1 -> 21.00: crosses level 2
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(src)
    )
    out = threshold_alerts(stream, "user_id", "value", 1000)
    q = (
        out.writeStream.format("memory")
        .queryName("alerts_t")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.alert_level)
            for r in spark.sql("SELECT * FROM alerts_t").collect()
        )
    finally:
        q.stop()
    # same alerts as a single-batch run: levels depend only on totals
    assert got == [(1, 1), (1, 2)]


def test_threshold_alerts_schema_follows_key_col(spark, tmp_path):
    """The output key column takes its NAME and TYPE from key_col —
    a string supplier_id caller must not get a long 'user_id' column
    (round-4 advisor item on the hardcoded ALERT_SCHEMA)."""
    from social_and_media_data_ingestion_spark.streaming.stateful import (
        threshold_alerts,
    )

    schema = T.StructType(
        [
            T.StructField("supplier_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "alert_src2")
    ckpt = str(tmp_path / "alert_ckpt2")
    spark.createDataFrame(
        [("s-1", 12.0), ("s-2", 3.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = threshold_alerts(stream, "supplier_id", "value", 1000)
    assert out.schema["supplier_id"].dataType == T.StringType()
    assert [f.name for f in out.schema.fields] == ["supplier_id", "alert_level"]
    q = (
        out.writeStream.format("memory")
        .queryName("alerts_k")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.supplier_id, r.alert_level)
            for r in spark.sql("SELECT * FROM alerts_k").collect()
        )
    finally:
        q.stop()
    assert got == [("s-1", 1)]
