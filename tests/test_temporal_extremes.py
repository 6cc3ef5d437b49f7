"""Temporal-extremes harness (round 11) — the next adversarial probe
in the r7-r11 lineage (nulls → empty/one-row → dup-PK → hostile
docs/names → non-finite → skew → TIME): every events-only and
orders-only registry query runs against tables whose timestamps sit on
the calendar's trap doors — the epoch itself, pre-epoch dates, the
far future, ISO-week-53 year boundaries (2021-01-01 belongs to ISO
week 53 OF 2020), a leap day, the last/first seconds of a year,
sub-second precision, and heavy EXACT-tie clusters — Spark vs its
DuckDB oracle, value-compared. Date bucketing, week numbering,
sessionization gaps, watermark-style dedup ordering, and interval
arithmetic all have engine-specific conventions; a query that leans on
one un-pinned convention diverges here first.

Extremes stay inside pandas' ns-timestamp range (1678-2261): the sweep
compares through toPandas(), and a year-9999 value would overflow the
COMPARISON, reporting a harness artifact as a query defect.

Ties are the sharpest probe: several window queries order by ts alone
within a partition; with exact duplicates a bare row_number would be
nondeterministic ACROSS ENGINES. The fixture plants 8-way exact-tie
clusters so any such query must either break ties deterministically
(the repo convention: a unique id as the final sort key) or aggregate
tie-insensitively — both verified by the value compare.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from social_and_media_data_ingestion_spark.plans.queries import registry

from .test_skew_stress import _single_table_queries, _sweep


@pytest.fixture(scope="module")
def extreme_events_dir(spark, tmp_path_factory):
    """220 events across the calendar's trap doors, with 8-way exact-tie
    clusters and microsecond-precision stragglers."""
    tmp = tmp_path_factory.mktemp("timeevents")
    anchors = [
        dt.datetime(1970, 1, 1, 0, 0, 0),           # the epoch itself
        dt.datetime(1901, 7, 16, 23, 59, 59),       # pre-epoch
        dt.datetime(2261, 12, 31, 23, 59, 59),      # far future (ns-safe)
        dt.datetime(2020, 12, 31, 23, 59, 59),      # ISO week 53 of 2020
        dt.datetime(2021, 1, 1, 0, 0, 0),           # …and its year boundary
        dt.datetime(2024, 2, 29, 12, 0, 0),         # leap day
        dt.datetime(2023, 12, 31, 23, 59, 59),      # last second of a year
        dt.datetime(2024, 1, 1, 0, 0, 0),           # first second of the next
        dt.datetime(2024, 3, 10, 2, 30, 0),         # inside a US DST gap
        dt.datetime(1999, 12, 31, 23, 59, 59, 999999),  # µs straggler
        dt.datetime(2000, 2, 29, 0, 0, 0),          # century leap day
    ]
    rows = []
    eid = 0
    for a_i, anchor in enumerate(anchors):
        for k in range(20):
            if k < 8:
                ts = anchor  # 8-way EXACT tie on every anchor
            else:
                ts = anchor + dt.timedelta(
                    seconds=k * 37, microseconds=(k * 123456) % 1000000
                )
            rows.append(
                (
                    eid,
                    ts,
                    (eid % 7) + 1,
                    ["view", "click", "purchase"][eid % 3],
                    float(eid % 53),
                    '{"k": 1}',
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def extreme_orders_dir(spark, tmp_path_factory):
    """180 orders whose o_orderdate hits the same trap doors (the
    column is a midnight-normalized timestamp in the lake), with tie
    clusters per date and totals that exercise the money quantizers."""
    tmp = tmp_path_factory.mktemp("timeorders")
    dates = [
        dt.datetime(1970, 1, 1),
        dt.datetime(1901, 7, 16),
        dt.datetime(2261, 12, 30),
        dt.datetime(2020, 12, 31),
        dt.datetime(2021, 1, 1),
        dt.datetime(2024, 2, 29),
        dt.datetime(2023, 12, 31),
        dt.datetime(2024, 1, 1),
        dt.datetime(2000, 2, 29),
    ]
    rows = []
    for i in range(180):
        rows.append(
            (
                i,
                (i % 31) + 1,
                ["O", "F", "P"][i % 3],
                round(100.0 + i * 7.77, 2),
                dates[i % len(dates)],
                f"{(i % 5) + 1}-X",
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    return str(tmp)


def test_every_events_query_agrees_on_extreme_timestamps(
    spark, extreme_events_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{extreme_events_dir}/events.parquet/*.parquet')"
    )
    reg = registry()
    names = _single_table_queries(
        "events", skip={"agg_quantile_sketch_audit"}
    )
    assert len(names) >= 40
    bad = _sweep(spark, reg, names, extreme_events_dir, con)
    assert not bad, "\n".join(bad)


def test_every_orders_query_agrees_on_extreme_dates(
    spark, extreme_orders_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{extreme_orders_dir}/orders.parquet/*.parquet')"
    )
    reg = registry()
    names = _single_table_queries("orders")
    assert len(names) >= 10
    bad = _sweep(spark, reg, names, extreme_orders_dir, con)
    assert not bad, "\n".join(bad)


def test_iso_week_bucketing_pinned_at_year_boundary(spark, extreme_events_dir):
    """Direct probe of the sharpest trap: 2021-01-01 is ISO week 53 OF
    2020 and 2024-01-01 is ISO week 1 of 2024 (not week 52/53 of 2023).
    Any query bucketing by week must place boundary days exactly where
    the ISO calendar does — cross-checked against Python's own
    isocalendar, independent of both engines."""
    from pyspark.sql import functions as F

    from social_and_media_data_ingestion_spark.plans.tables import t

    e = t(spark, extreme_events_dir, "events")
    got = {
        (r.d, r.wy, r.wk)
        for r in e.select(
            F.to_date("ts").alias("d"),
            F.expr("extract(yearofweek from ts)").cast("int").alias("wy"),
            F.weekofyear("ts").alias("wk"),
        )
        .distinct()
        .collect()
    }
    for d, wy, wk in got:
        iso = d.isocalendar()
        assert (iso[0], iso[1]) == (wy, wk), (d, wy, wk, iso)


def test_sessionize_across_year_boundary(spark, extreme_events_dir):
    """events_sessionize must NOT cut a session at a calendar boundary:
    the fixture's 2023-12-31 23:59:59 and 2024-01-01 00:00:00 anchors
    are 1 s apart, so for any user holding events in both clusters the
    two must share one session (gap < 30 min) — asserted through the
    registry query itself so the probe exercises shipped code."""
    reg = registry()
    df = reg["events_sessionize"].spark(spark, extreme_events_dir).toPandas()
    # find the session ids covering the two boundary instants per user
    import pandas as pd

    ts_a = pd.Timestamp("2023-12-31 23:59:59")
    ts_b = pd.Timestamp("2024-01-01 00:00:00")
    col_ts = [c for c in df.columns if df[c].dtype.kind == "M"]
    assert col_ts, f"no timestamp column in sessionize output: {df.columns}"
    tcol = col_ts[0]
    sess_cols = [c for c in df.columns if "session" in c.lower()]
    assert sess_cols, f"no session column in {df.columns}"
    scol = sess_cols[0]
    both = df[df[tcol].isin([ts_a, ts_b])]
    for _uid, grp in both.groupby("user_id"):
        if {ts_a, ts_b} <= set(grp[tcol]):
            assert grp[scol].nunique() == 1, (
                f"user {_uid}: 1-second gap across the year boundary split "
                f"sessions {sorted(grp[scol].unique())}"
            )
