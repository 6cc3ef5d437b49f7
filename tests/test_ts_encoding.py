"""Timestamp-encoding robustness: the same events rows written under every
parquet timestamp encoding the testdata generator has ever used must produce
IDENTICAL results — batch and streaming.

Round-2 regression: /root/testdata regenerated events.ts from
TIMESTAMP(NANOS) to timestamp[us] (Spark TIMESTAMP_NTZ) and five queries
broke (illegal NTZ->BIGINT casts, a hard-coded nanos readStream schema).
This pins the fix: plans.tables normalizes ts to TIMESTAMP_LTZ for any
physical encoding, so a future regeneration cannot silently skew windows.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from social_and_media_data_ingestion_spark.plans.tables import events_stream, t

ENCODINGS = ["ns", "us_ntz", "us_tz"]

# Enough rows/users to form multiple sessions per user with gaps straddling
# the 30-min sessionization threshold and several 5-min windows.
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
ROWS = []
_eid = 0
for user in range(4):
    cursor = BASE + dt.timedelta(minutes=user * 7)
    for gap_min in [0, 5, 31, 2, 29, 30, 61, 1, 90, 15]:
        cursor = cursor + dt.timedelta(minutes=gap_min, seconds=user)
        ROWS.append(
            {
                "event_id": _eid,
                "ts": cursor,
                "user_id": user,
                "event_type": ["view", "click", "purchase"][_eid % 3],
                "value": float(_eid % 17) / 4.0,
                "props": '{"k": %d}' % (_eid % 5),
            }
        )
        _eid += 1


def _write(tmpdir: str, encoding: str) -> str:
    import os

    ts_us = [
        int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for r in ROWS
    ]
    if encoding == "ns":
        ts_arr = pa.array([v * 1000 for v in ts_us], type=pa.timestamp("ns"))
    elif encoding == "us_ntz":
        ts_arr = pa.array(ts_us, type=pa.timestamp("us"))
    else:
        ts_arr = pa.array(ts_us, type=pa.timestamp("us", tz="UTC"))
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in ROWS], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r["user_id"] for r in ROWS], type=pa.int64()),
            "event_type": pa.array([r["event_type"] for r in ROWS]),
            "value": pa.array([r["value"] for r in ROWS], type=pa.float64()),
            "props": pa.array([r["props"] for r in ROWS]),
        }
    )
    sf_dir = f"{tmpdir}/{encoding}"
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(table, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    out = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"events_{enc}")
        _write(str(d), enc)
        out[enc] = f"{d}/{enc}"
    return out


def test_batch_loader_normalizes_to_ltz(spark, encoded_dirs):
    for enc, sf_dir in encoded_dirs.items():
        df = t(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            f"{enc}: expected TIMESTAMP_LTZ, got {df.schema['ts'].dataType}"
        )


def _collect_sessionize(spark, sf_dir):
    from social_and_media_data_ingestion_spark.plans.queries import registry

    df = registry()["events_sessionize"].spark(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def _collect_stream_counts(spark, sf_dir):
    import uuid

    from pyspark.sql import functions as F

    from social_and_media_data_ingestion_spark.streaming.pipeline import (
        run_to_memory,
        windowed_counts,
    )

    stream = events_stream(spark, sf_dir)
    agg = windowed_counts(stream, "ts", window="5 minutes", group_cols=["event_type"])
    name = f"enc_test_{uuid.uuid4().hex[:8]}"
    query = run_to_memory(agg, name, output_mode="complete")
    query.stop()
    rows = spark.sql(f"SELECT window_start, event_type, n FROM {name}").collect()
    return sorted(tuple(r) for r in rows)


def test_sessionize_identical_across_encodings(spark, encoded_dirs):
    results = {e: _collect_sessionize(spark, d) for e, d in encoded_dirs.items()}
    assert results["ns"], "empty result would vacuously pass"
    assert results["ns"] == results["us_ntz"] == results["us_tz"]


def test_stream_windowed_counts_identical_across_encodings(spark, encoded_dirs):
    results = {e: _collect_stream_counts(spark, d) for e, d in encoded_dirs.items()}
    assert results["ns"], "empty result would vacuously pass"
    assert results["ns"] == results["us_ntz"] == results["us_tz"]
    # windows must reflect real event times, not 1000x-compressed ones:
    # >1 distinct window_start proves the micros/nanos scaling is right.
    starts = {r[0] for r in results["us_ntz"]}
    assert len(starts) > 1
