"""Structured Streaming pipelines (SURVEY §2.9 T1-T8).

The reference's Twitter loop is a hand-rolled micro-batch stream; here the
same semantics ride Structured Streaming proper:
- T2 offset checkpointing  -> checkpointLocation WAL
- T3 event-time watermark  -> withWatermark
- T4 incremental append    -> outputMode("append")
- T5 fixed inter-batch gap -> trigger(processingTime=...)
- T8 (beyond parity) duplicate suppression within the watermark
  -> dropDuplicates on id — the reference re-appends duplicates on rerun.

All builders accept any streaming DataFrame; tests drive them with a
file source + memory sink via processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_stream(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    return spark.readStream.format(fmt).schema(schema).load(path)


def dedup_within_watermark(
    df: DataFrame,
    id_col: str | list[str],
    ts_col: str,
    delay: str = "10 minutes",
    include_ts: bool = True,
) -> DataFrame:
    """T8: exactly-once-per-key within the watermark horizon. State is
    bounded by the watermark — safe for unbounded streams. `id_col` may
    be one column or a composite key list; include_ts=False dedups on
    the key alone (e.g. one-event-per-user-per-bucket suppression,
    where the bucket column already encodes coarse event time)."""
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    if include_ts:
        keys = keys + [ts_col]
    return df.withWatermark(ts_col, delay).dropDuplicates(keys)


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    delay: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count + sum over an event stream with late-data
    tolerance `delay`. Append-mode-compatible (watermarked)."""
    keys = [F.window(ts_col, window).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    group_cols: list[str] | None = None,
    delay: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation over an event stream via the native
    F.session_window stateful operator: a session closes when no event
    arrives for `gap`. State is per (key, open session) and merges
    overlapping windows as events arrive — the streaming twin of the
    batch gaps-and-islands spelling (events_sessionize). Pass `delay` to
    watermark for append-mode sinks (finalized sessions only); without
    it, use complete/update output."""
    src = df.withWatermark(ts_col, delay) if delay else df
    keys = [F.session_window(ts_col, gap).alias("sw")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        src.groupBy(*keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            *[F.col(c) for c in (group_cols or [])],
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    trigger_seconds: float | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Start -> drain available input -> return query (caller stops it).
    The synchronous local harness for streaming tests."""
    writer = df.writeStream.outputMode(output_mode).format("memory").queryName(
        query_name
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    q = writer.start()
    q.processAllAvailable()
    return q


def append_to_parquet(
    df: DataFrame, out_path: str, checkpoint_path: str, available_now: bool = True
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """T2+T4: append sink with offset WAL; availableNow drains and stops
    (the reference's run-to-exhaustion loop, resumable by checkpoint)."""
    writer = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with event-time bound: right event must land
    within [left_ts - within, left_ts + within]. Both sides watermarked so
    the join state is GC-able (unbounded state otherwise — the thing that
    kills long-running stream-stream joins). `right_ts` is renamed
    `right_<ts>` in the output to keep both event times."""
    r_ts_out = f"right_{right_ts}"
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withColumnRenamed(right_ts, r_ts_out)
    for k in keys:
        r = r.withColumnRenamed(k, f"right_{k}")
    r = r.withWatermark(r_ts_out, delay).alias("r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"right_{k}"))
    cond = (
        cond
        & (F.col(r_ts_out) >= F.expr(f"l.{left_ts} - INTERVAL {within}"))
        & (F.col(r_ts_out) <= F.expr(f"l.{left_ts} + INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(*[f"right_{k}" for k in keys])


def stream_static_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a static
    (batch) dimension table. Stateless — Structured Streaming re-plans the
    static side per micro-batch (so dim refreshes are picked up on file
    sources) and needs no watermark for stream-static equi-joins. The dim
    is broadcast: at 100 TB of stream the enrichment stays map-side.
    Parity note: this is the streaming spelling of the reference's
    allowlist semi-join (reddit_subm_extraction.py:52-55) applied to a
    live feed."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def stream_transform_to_parquet(
    stream_df: DataFrame,
    transform,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Run an arbitrary batch transform per micro-batch (foreachBatch),
    appending each batch's result to `out_dir`; drain with availableNow
    and return a batch DataFrame over the combined output. The escape
    hatch for operators Structured Streaming can't express natively
    (non-time windows, iterative logic) — correct whenever the transform
    treats rows independently of which batch they arrive in."""
    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        transform(batch_df).write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def stream_asof_enrich(
    stream_df: DataFrame,
    ref_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    on: list[str],
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    **asof_kwargs,
) -> DataFrame:
    """Streaming point-in-time (as-of) enrichment against a STATIC
    reference: each micro-batch runs operators.temporal_join.asof_join
    via foreachBatch and appends to `out_dir` (parquet). Correct under
    ANY batching: a probe's match depends only on the static reference,
    never on other probes, so per-batch as-of == whole-stream as-of
    (pinned by tests/test_temporal_join.py::test_stream_asof_multi_batch
    with a multi-file multi-batch source).

    The window-based as-of spelling itself cannot run inside Structured
    Streaming (non-time windows are unsupported on streams); foreachBatch
    is the standard escape hatch, and the feature-store "enrich events
    with the latest model/price/config version at event time" pattern is
    exactly this shape. Drains with availableNow and returns a batch
    DataFrame over the appended output.
    """
    from social_and_media_data_ingestion_spark.operators.temporal_join import (
        asof_join,
    )

    return stream_transform_to_parquet(
        stream_df,
        lambda batch_df: asof_join(
            batch_df,
            ref_df,
            on=on,
            probe_ts=probe_ts,
            ref_ts=ref_ts,
            value_cols=value_cols,
            **asof_kwargs,
        ),
        out_dir,
        checkpoint_dir,
    )
