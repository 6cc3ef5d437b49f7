"""Test-table loaders for /root/testdata/sf* parquet."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics must be UTC for oracle comparison regardless of
    # which session the caller built (runtime-settable session conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
        # default. Set the legacy conf at runtime so this works under ANY
        # caller-provided session (the driver builds its own), then convert
        # below. Session-scoped, runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as long via nanosAsLong; truncate to micros
        # (same truncation DuckDB applies converting ns -> us).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so callers can use the
    plain SQL entry point (spark.sql) over the same data the DataFrame
    builders see."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """SQL entry point: views + spark.sql(query)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
