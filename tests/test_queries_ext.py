"""Edge-case tests for the registry extension (queries_ext.py).

The oracle gate covers the bulk correctness; these pin the corner cases
the sf-data can't reach: short-doc shingle guard, zero-duration frame
sampling, and registry integrity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators import multimodal as MM
from social_and_media_data_ingestion_spark.plans.queries import registry


def test_registry_has_ext_queries():
    reg = registry()
    for name in [
        "q6_forecast_revenue",
        "agg_grouping_sets",
        "events_hopping_window",
        "multimodal_frame_sample",
        "text_shingles_3gram",
    ]:
        assert name in reg
    # every SQL-expressible entry carries an oracle
    assert sum(1 for d in reg.values() if d.oracle is None) <= 2


def test_shingles_short_doc_guard(spark):
    # docs with <3 tokens must yield 0 shingles, not a descending-sequence
    # artifact (sequence(1,0) == [1,0] in Spark)
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, ""), (4, "single")],
        ["doc_id", "text"],
    )
    toks = F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "")
    shingles = F.expr(
        "transform(sequence(1, greatest(size(toks) - 2, 0)), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1), "
        "' ', element_at(toks, i+2)))"
    )
    out = (
        df.withColumn("toks", toks)
        .withColumn(
            "shingles",
            F.when(F.size("toks") >= 3, shingles).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .select("doc_id", F.size("shingles").alias("n"))
        .collect()
    )
    got = {r["doc_id"]: r["n"] for r in out}
    assert got == {1: 0, 2: 2, 3: 0, 4: 0}


def test_frame_sample_zero_duration(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 2500), (3, 1000)], ["media_id", "duration_ms"]
    )
    rows = MM.sample_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(
            (r["frame_index"], r["frame_offset_ms"])
        )
    assert 1 not in by_id  # zero duration -> no frames
    assert sorted(by_id[2]) == [(0, 0), (1, 1000), (2, 2000)]
    assert sorted(by_id[3]) == [(0, 0)]


def test_hopping_window_covers_each_event_twice(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:02:00", "a", 1.0), ("2024-01-01 00:07:30", "a", 2.0)],
        ["ts_s", "event_type", "value"],
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    out = (
        df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # 2 events x 2 windows each, 3 distinct windows (the middle one shared)
    assert sum(r["n"] for r in out) == 4
    assert len(out) == 3


def test_kmeans_centroid_memo_keyed_by_sf_dir(spark):
    """The per-sf_dir centroid memo must not leak centroids across
    scale factors (different files -> different vectors)."""
    from social_and_media_data_ingestion_spark.plans.queries_ext import (
        _kmeans_seed_centroids,
    )

    a = _kmeans_seed_centroids(spark, "/root/testdata/sf0.001")
    b = _kmeans_seed_centroids(spark, "/root/testdata/sf0.01")
    assert len(a) == len(b) == 8
    assert [cid for cid, _ in a] == list(range(8))
    # memo returns the SAME object on a second call (no re-collect)
    assert _kmeans_seed_centroids(spark, "/root/testdata/sf0.001") is a
