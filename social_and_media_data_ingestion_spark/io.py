"""Readers and writers.

Scale notes:
- `.zst` is a non-splittable codec: one task per file. Parallelism therefore
  equals file count (the reference had the same model — one OS process per
  file, reddit_subm_extraction.py:97-103). For 100 TB landings, recompress
  to splittable parquet on first touch via `landing_to_parquet`.
- JSON reads use PERMISSIVE mode with a corrupt-record column so bad-line
  accounting (ref reddit_subm_extraction.py:91-93) is a cheap aggregate,
  not a per-row try/except.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from social_and_media_data_ingestion_spark.schemas import CORRUPT_COL


def read_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    ignore_corrupt_files: bool = False,
) -> DataFrame:
    """NDJSON (optionally .zst/.gz — decompressed by Hadoop codec by
    extension) with corrupt-record capture. Parity with the reference's
    json.loads-with-skip loop (reddit_subm_extraction.py:83-93), but the
    JSON parse is JVM-side and field-pruned by Catalyst (OptimizeJsonExprs).

    Implementation: `text` scan + `from_json` rather than the json reader —
    the json reader's internal corrupt-record column cannot be referenced
    on its own (Spark restriction), which breaks bad-row accounting plans;
    with from_json the corrupt column is an ordinary computed column.

    ``ignore_corrupt_files``: the PERMISSIVE corrupt-record column only
    protects against bad LINES — a truncated or corrupt compressed
    archive throws in the Hadoop codec itself and kills the whole scan
    (one bad file in a 100 TB landing = a dead multi-hour job). True
    sets the file-source ``ignoreCorruptFiles`` option: the scan keeps
    every line decoded before the corruption point, skips the rest of
    that file with a warning, and continues. Default False because
    silently dropping data must be an explicit operator decision —
    pair it with scan metrics (`with_scan_metrics`) so the loss is
    visible in the run's numbers."""
    reader = spark.read
    if ignore_corrupt_files:
        reader = reader.option("ignoreCorruptFiles", "true")
    lines = reader.text(path)
    parsed = lines.select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j")
    )
    return parsed.select("j.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows, bad_rows). Replaces the reference's `bad` counter with a
    side output; count(bad_rows) reproduces the metric. The bad side keeps
    the full schema: Spark forbids plans referencing ONLY the internal
    corrupt-record column of a JSON scan."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def read_csv_dim(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Dimension-table CSV scan (ref reddit_subm_extraction.py:20-21)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_binary_files(spark: SparkSession, glob: str) -> DataFrame:
    """1 row per file: (path, modificationTime, length, content binary).
    The scan feeding the HTML-article UDTF (SURVEY §2.1 S4)."""
    return spark.read.format("binaryFile").load(glob)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header CSV sink (ref reddit_subm_extraction.py:74-76)."""
    df.write.option("header", True).mode(mode).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def landing_to_parquet(
    spark: SparkSession,
    src_glob: str,
    schema: T.StructType,
    dst: str,
    partition_by: list[str] | None = None,
    bad_dst: str | None = None,
) -> None:
    """Recompress non-splittable NDJSON(.zst) landings into splittable,
    column-pruned parquet — the first move of any 100 TB pipeline.
    With bad_dst, corrupt rows are persisted there (full schema incl.
    the corrupt-record column) so bad-line accounting survives staging."""
    df = read_ndjson(spark, src_glob, schema)
    good, bad = split_corrupt(df)
    write_parquet(good, dst, partition_by=partition_by)
    if bad_dst is not None:
        write_parquet(bad, bad_dst)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    sort_within_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite `src` into ~target_file_mb files.
    Small files are the silent killer of 100 TB scans (1 task + 1 footer
    read per file); compaction restores full-size row groups. Returns the
    target file count (per physical partition when partition_by is set).
    Optional sortWithinPartitions improves row-group min/max pruning for
    later range predicates on those columns.

    Hive-partitioned sources: sizing lists files recursively, so nested
    `key=value` directories are counted. Pass partition_by to PRESERVE the
    physical layout on rewrite — without it the output is unpartitioned
    and former partition columns become plain data columns."""
    df = spark.read.parquet(src)
    total_bytes = sum(
        int(r.length)
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", True)
        .load(src)
        .select("length")
        .collect()
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    if partition_by:
        # spread within each partition dir; repartition on the partition
        # columns so each output dir gets coherent, full-size files
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    return n_files


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (zlib-striped columnar; the warehouse interchange format
    Hive-era consumers expect). Same partitioning contract as
    :func:`write_parquet`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning apply exactly as
    for parquet (both are Catalyst FileScan sources)."""
    return spark.read.orc(path)
