"""Test-table loaders for /root/testdata/sf* parquet.

``events.ts`` has shipped under three different physical parquet
encodings across testdata generations: TIMESTAMP(NANOS) (which Spark
only reads via the ``nanosAsLong`` legacy conf), plain ``timestamp[us]``
(read as TIMESTAMP_NTZ), and tz-aware micros (read as TIMESTAMP_LTZ).
Everything downstream assumes one logical type, so normalization happens
HERE, once, for both batch (:func:`t`) and streaming
(:func:`events_stream`) reads: whatever the file says, callers see
TIMESTAMP_LTZ under a UTC session — the type on which ``unix_micros``,
``cast('long')``, windowing, and the DuckDB oracles all agree.
"""

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


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to TIMESTAMP_LTZ regardless of how the
    parquet writer encoded it (nanos-as-long / micros-NTZ / tz-aware)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # TIMESTAMP(NANOS) read as long via nanosAsLong; truncate to micros
        # (same truncation DuckDB applies converting ns -> us).
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        # timestamp[us] without tz: interpret the wall-clock in the session
        # zone (pinned to UTC below), matching DuckDB's naive-read semantics.
        return df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics must be UTC for oracle comparison regardless of
    # which session the caller built (runtime-settable session conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet may store TIMESTAMP(NANOS), which Spark rejects by
        # default. Set the legacy conf at runtime so this works under ANY
        # caller-provided session (the driver builds its own), then
        # normalize below. Session-scoped, runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_ts(df)
    return df


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the SAME ts normalization as the
    batch loader. The file's actual schema is probed from a batch read (a
    metadata-only operation) instead of being hard-coded, so a testdata
    regeneration that changes the physical timestamp encoding cannot skew
    streaming windows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        # glob form: FileStreamSource requires a directory basePath
        .load(f"{sf_dir}/events.parque[t]")
    )
    return _normalize_ts(stream)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over documents.parquet (schema probed from a batch
    read — metadata-only; no timestamp column, so no normalization)."""
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        # glob form: FileStreamSource requires a directory basePath
        .load(f"{sf_dir}/documents.parque[t]")
    )


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


# Valid-vector contract (round 7): a NULL embedding (failed encoder), an
# empty array, or an all-zero vector (no direction -> cosine is 0/0)
# cannot participate in ANY vector operation — on a real lake they exist,
# and unguarded they either ANSI-crash the job (DIVIDE_BY_ZERO at the
# norm, INVALID_ARRAY_INDEX in PCA) or poison driver-side centroid
# bootstraps (found by the r7 null-riddled embeddings probe: 21 of 24
# vector queries died). Every vector query loads through `vectors()` and
# mirrors VALID_EMBEDDING_SQL in its oracle; the filter is a no-op on
# the generated testdata and pushes the IS NOT NULL conjunct to the
# parquet scan.
VALID_EMBEDDING_SQL = (
    "embedding IS NOT NULL AND len(embedding) > 0 "
    "AND len(list_filter(embedding, x -> x <> 0)) > 0"
)


def vectors(
    spark: SparkSession, sf_dir: str, dim: int | None = None
) -> DataFrame:
    """The embeddings table under the valid-vector contract.

    DIMENSION contract (r7 mixed-dim probe): vector math additionally
    assumes a dim-consistent corpus — `zip_with` silently truncates a
    wrong-dim pair to the shorter length (corrupt cosines, no error)
    and index-based access ANSI-crashes past the shorter end. Mixed
    dims are DETECTED by the `emb_dim_audit` registry query (the
    ingestion gate, like `events_nonfinite_audit` for non-finite
    metrics); corpora that fail it pass the modal dimension here as
    `dim` to enforce the cure. The registry's own queries leave
    dim=None — the generated testdata is dim-consistent by
    construction, and an unconditional equality filter would cost a
    dim-discovery job on every map-only vector plan."""
    from pyspark.sql import functions as F

    base = t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & F.exists("embedding", lambda x: x != 0)
    )
    if dim is not None:
        base = base.filter(F.size("embedding") == dim)
    return base
