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
