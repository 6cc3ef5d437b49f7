"""Null-riddled-tables harness (round 7): every documents-only and
events-only registry query runs against a table with NULLs in every
nullable column, Spark vs its DuckDB oracle, value-compared — the same
contract as the driver gate, on inputs the generated testdata never
contains.

The events sweep found two more defects beyond the seven below: the
decayed-activity type join dropped the NULL-type group (null-rejecting
key; fixed with a sentinel key — eqNullSafe also fixes it but measured
~3x slower on the broadcast join), and PSI's oracle lost the NULL-type
row at its USING join while Spark's window-partitioned total kept it
(both sides now null-safe).

The documents sweep found and now pins seven real defects:
- text_language_id: NULL hit counts fell through the oracle's CASE to
  ELSE 'fr' (Spark said 'unk');
- text_kwic_contexts: sequence(1, size(tk)) on an EMPTY token array
  steps BACKWARD in Spark ([1,0]) and element_at threw
  INVALID_ARRAY_INDEX under ANSI — a job-killing crash;
- minhash LSH: concat_ws SKIPS nulls, folding every unshingleable doc
  into one shared garbage bucket (quadratic hot-bucket at scale) that
  the oracle's NULL-propagating || never built;
- minhash signatures: '' (Spark array_join) vs NULL (DuckDB
  array_to_string) for the all-NULL signature;
- sample_fixed_quota_per_source: NULL sampling key ordered NULLS FIRST
  by Spark, NULLS LAST by DuckDB — every rank in the partition
  permuted;
- array_set_ops: the engines' NULL-in-set-algebra rules disagree (and
  DuckDB's are internally inconsistent) — empty-set semantics are the
  only common spelling;
- multimodal fakes: bytes(None) crashed whole Arrow batches; the
  image-profile oracle invented channels=3 for never-decoded payloads;
  DuckDB string_split('','') is [''] while list(b'') is [].
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from social_and_media_data_ingestion_spark.plans.queries import registry

# Whole-registry sweep: minutes per test, deselected by default (see
# pytest.ini). Run with -m "slow or not slow" after any closure edit
# and before round close.
pytestmark = pytest.mark.slow

OTHER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
]


@pytest.fixture(scope="module")
def null_docs_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nulldocs")
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "alpha beta gamma",
                None,
                "",
                "delta alpha",
                None,
                "epsilon zeta eta theta iota",
                "alpha beta gamma",
                None,
            ],
            "lang": ["en", None, "de", None, "en", None, "en", "de"],
            "source": ["src0", "src1", None, "src0", None, "src1", None, "src0"],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


def _documents_only_queries():
    out = []
    for name, qd in registry().items():
        if qd.oracle is None:
            continue
        o = qd.oracle.lower()
        if "documents" not in o:
            continue
        if any(re.search(rf"\b{t}\b", o) for t in OTHER_TABLES):
            continue
        if name == "sql_passthrough_agg":
            # register_views loads EVERY table up front, so it needs a
            # full sf dir — a harness limitation, not a null defect
            continue
        out.append(name)
    return out


def test_every_documents_query_agrees_on_null_riddled_table(
    spark, null_docs_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{null_docs_dir}/documents.parquet/*.parquet')"
    )
    reg = registry()
    names = _documents_only_queries()
    assert len(names) >= 65  # the sweep is broad, not a cherry-pick
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, null_docs_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001 - collect, report all
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


def test_lsh_drops_unshingleable_docs_not_garbage_bucket(spark):
    """Docs with NULL min-hashes must produce NO candidates — without
    the filter they all share one concat_ws('') bucket and pair
    quadratically."""
    from social_and_media_data_ingestion_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "a b c d e"), (5, "a b c d e")],
        "doc_id bigint, text string",
    )
    sigs = D.minhash_signatures(df, "doc_id", "text", n=3, num_hashes=4)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(sigs, bands=2, rows_per_band=2).collect()
    }
    assert pairs == {(4, 5)}  # identical real docs pair; null/empty never


@pytest.fixture(scope="module")
def null_events_dir(spark, tmp_path_factory):
    import datetime as dt

    tmp = tmp_path_factory.mktemp("nullevents")
    rows = []
    types = ["view", None, "click", "purchase", None]
    for eid in range(40):
        rows.append(
            (
                eid,
                dt.datetime(2024, 1, 1, 10, eid % 30, eid % 60),
                eid % 5,
                types[eid % 5],
                None if eid % 7 == 0 else float(eid % 9),
                None if eid % 3 == 0 else '{"k": 1}',
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    return str(tmp)


def _events_only_queries():
    others = [t for t in OTHER_TABLES if t != "events"] + ["documents"]
    out = []
    for name, qd in registry().items():
        if qd.oracle is None:
            continue
        o = qd.oracle.lower()
        if "events" not in o:
            continue
        if any(re.search(rf"\b{t}\b", o) for t in others):
            continue
        if name.startswith("stream_"):
            continue  # streaming harness lives in test_streaming.py
        if name == "agg_quantile_sketch_audit":
            # its pinned-TRUE oracle asserts the percentile sketch lands
            # within 1% of range, a contract valid at testdata group
            # sizes — on this 6-value fixture the sketch legitimately
            # misses; not a NULL defect
            continue
        out.append(name)
    return out


def test_every_events_query_agrees_on_null_riddled_table(
    spark, null_events_dir
):
    """NULL event_type / value / props across every events-only query.
    Found in r7: the decayed-activity type join dropped the NULL-type
    group's sum (null-rejecting key; now eqNullSafe), and PSI's oracle
    lost the NULL-type row at its USING join while Spark's
    window-partitioned total kept it (both sides now match types with
    null-safe equality)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet/*.parquet')"
    )
    reg = registry()
    names = _events_only_queries()
    assert len(names) >= 50
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, null_events_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


@pytest.fixture(scope="module")
def null_embeddings_dir(spark, tmp_path_factory):
    import numpy as np

    tmp = tmp_path_factory.mktemp("nullemb")
    rng = np.random.RandomState(7)
    rows = []
    for vid in range(30):
        if vid % 9 == 0:
            emb = None  # failed encoder
        elif vid % 9 == 1:
            emb = []  # degenerate empty vector
        elif vid % 9 == 2:
            emb = [0.0] * 64  # zero-norm: no direction, cosine is 0/0
        else:
            emb = [float(round(x, 3)) for x in rng.randn(64)]
        rows.append((vid, emb, None if vid % 5 == 0 else vid % 4))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
        "vec_id bigint, embedding array<float>, label int",
    )
    sdf.write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def _embeddings_only_queries():
    others = [t for t in OTHER_TABLES if t != "embeddings"] + [
        "documents",
        "events",
    ]
    return [
        name
        for name, qd in registry().items()
        if qd.oracle
        and "embeddings" in qd.oracle.lower()
        and not any(re.search(rf"\b{t}\b", qd.oracle.lower()) for t in others)
    ]


def test_every_embeddings_query_agrees_on_null_riddled_table(
    spark, null_embeddings_dir
):
    """NULL / empty / zero-norm vectors across every embeddings-only
    query. Before the r7 valid-vector contract (plans/tables.vectors +
    the mirrored valid_embeddings oracle CTE), 21 of 24 vector queries
    DIED on this fixture: ANSI DIVIDE_BY_ZERO at the cosine norm,
    INVALID_ARRAY_INDEX in PCA, and NoneType poisoning of the
    driver-side k-means/PQ centroid bootstraps."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{null_embeddings_dir}/embeddings.parquet/*.parquet')"
    )
    reg = registry()
    names = _embeddings_only_queries()
    assert len(names) >= 24
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, null_embeddings_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


def test_streaming_queries_survive_null_riddled_inputs(
    spark, null_events_dir, null_docs_dir
):
    """The nullable-column-sensitive streaming operators must neither
    crash nor diverge from their oracles on null-riddled micro-batches
    (NULL event_type/value/props; NULL/empty document text feeding the
    shingle index). Batch-side nulls crashed Arrow batches and built
    garbage LSH buckets before the r7 fixes — the streaming paths share
    that machinery."""
    import shutil

    combined = null_events_dir  # events + documents side by side
    if not (
        __import__("os").path.exists(f"{null_events_dir}/documents.parquet")
    ):
        shutil.copytree(
            f"{null_docs_dir}/documents.parquet",
            f"{null_events_dir}/documents.parquet",
        )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{combined}/events.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{combined}/documents.parquet/*.parquet')"
    )
    reg = registry()
    bad = []
    for name in [
        "stream_dedup_watermark",
        "stream_stateful_running_totals",
        "stream_threshold_alerts",
        "stream_neardup_filter",
    ]:
        qd = reg[name]
        try:
            got = qd.spark(spark, combined).toPandas()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if qd.oracle is None:
            continue
        want = con.execute(qd.oracle).fetchdf()
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


@pytest.fixture(scope="module")
def extreme_ts_events_dir(spark, tmp_path_factory):
    import datetime as dt

    tmp = tmp_path_factory.mktemp("extremets")
    stamps = [
        dt.datetime(1969, 12, 31, 23, 59, 59),  # negative epoch second
        dt.datetime(1969, 7, 20, 20, 17, 40),
        dt.datetime(1970, 1, 1, 0, 0, 0),  # epoch zero
        dt.datetime(1900, 1, 1, 0, 0, 0),  # deep past
        dt.datetime(2024, 2, 29, 12, 0, 0),  # leap day
        dt.datetime(2024, 3, 31, 2, 30, 0),  # EU DST-gap wall time
        dt.datetime(2038, 1, 19, 3, 14, 8),  # past 32-bit rollover
    ]
    # year-9999 values are excluded NOT because the engines disagree but
    # because pandas/Arrow interchange (timestamp[ns]) cannot represent
    # them — the comparison harness would fail, not the query
    rows = []
    eid = 0
    for u in (1, 2):
        for k, ts in enumerate(stamps):
            rows.append(
                (eid, ts, u, ["view", "click", "purchase"][k % 3],
                 float(k), "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    return str(tmp)


def test_every_events_query_agrees_on_extreme_timestamps(
    spark, extreme_ts_events_dir
):
    """Pre-1970 (negative epoch), epoch zero, deep past, leap day, DST
    wall times, and post-2038 timestamps across every events-only
    query. Found in r7: DuckDB's `//` integer division truncates toward
    zero while Spark's floor(x/7) floors, so pre-1970 week indices were
    off by one in the retention/stickiness oracles; and
    events_percent_change_daily CRASHED under ANSI when a zero-revenue
    day became a lag() divisor (DuckDB's x/0 is NULL -> coalesce 0.0;
    Spark now try_divide's to match)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{extreme_ts_events_dir}/events.parquet/*.parquet')"
    )
    reg = registry()
    names = _events_only_queries()
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, extreme_ts_events_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


def test_nonfinite_audit_counts_and_contract(spark, tmp_path):
    """events_nonfinite_audit is the enforcement point of the
    finite-metrics contract: NaN/Inf survive IEEE arithmetic
    differently depending on expression shape across engines (and
    Spark's floor(inf * 10^dp) wraps to LONG_MAX-scale garbage while
    DuckDB keeps inf), so metric queries assume finite inputs and THIS
    query is the ingestion gate that finds violations. Exact counts on
    a fixture of every non-finite class, and the oracle agrees."""
    import datetime as dt

    vals = [
        float("nan"),
        float("inf"),
        float("-inf"),
        1e308,
        -0.0,
        None,
        5.0,
        1e-308,
    ]
    rows = [
        (i, dt.datetime(2024, 1, 1, 10, i, 0), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    # NOT via pandas: its NaN-is-missing convention would silently turn
    # the NaN row into a NULL before Spark ever sees it
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    reg = registry()
    got = reg["events_nonfinite_audit"].spark(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_rows, r.n_null, r.n_nan, r.n_inf, r.n_finite) == (8, 1, 1, 2, 4)
    assert r.finite_frac == 0.5
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.execute(reg["events_nonfinite_audit"].oracle).fetchall()
    assert want == [("view", 8, 1, 1, 2, 4, 0.5)]


def test_duplicate_event_ids_detected_and_curable(spark, tmp_path):
    """event_id is the events PK. Under at-least-once replays (exact
    duplicates) or upstream rewrites (same id, conflicting payload),
    per-id grouping, tie-breaks, and id-keyed joins are genuinely
    ambiguous — the r7 duplicate-id probe showed 54/57 events queries
    still agree cross-engine but 3 legitimately diverge on the violated
    PK. The engine's contract: detect via dq_constraint_report's
    events_pk_dups check, cure via the keep-first dedup operator, and
    only then run analytics."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    for eid in range(12):
        ts = dt.datetime(2024, 1, 1, 10, eid, 0)
        rows.append((eid, ts, eid % 3, "view", float(eid), "{}"))
        if eid % 4 == 0:  # at-least-once replay
            rows.append((eid, ts, eid % 3, "view", float(eid), "{}"))
        if eid % 5 == 0:  # same id, conflicting later payload
            rows.append(
                (eid, ts + dt.timedelta(seconds=30), eid % 3, "click",
                 float(eid) + 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    # the other tables the DQ report scans (minimal valid frames)
    spark.createDataFrame(
        [(1, 1, "O", 10.0, "1996-01-02", "1-URGENT", "c", 0, "x")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "Customer#1", "addr", 1, "p", 0.0, "s", "c")],
        "c_custkey bigint, c_name string, c_address string, "
        "c_nationkey bigint, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1, 1, 1, 5.0, 100.0, 0.1, 0.02, "N", "O",
          "1996-03-13", "1996-02-12", "1996-03-22", "D", "T", "c")],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string, l_commitdate string, "
        "l_receiptdate string, l_shipinstruct string, l_shipmode string, "
        "l_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(0, "some text", "en", "src0", 9)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    report = {
        r.check_id: (r.metric, r.passed)
        for r in registry()["dq_constraint_report"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # DETECT: 3 replays + 3 rewrites = 6 extra rows on 12 distinct ids
    assert report["events_pk_dups"] == (6.0, False)
    # CURE: keep-first dedup restores the PK ...
    ev = registry  # noqa: F841 - keep flake quiet about the import use
    from social_and_media_data_ingestion_spark.plans.tables import t as load_t

    events = load_t(spark, str(tmp_path), "events")
    # keep-FIRST per id = keep_latest's window with ascending order:
    # one row per event_id, earliest (ts, then stable payload) wins
    w = Window.partitionBy("event_id").orderBy(F.asc("ts"), F.asc("event_type"))
    cured = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert cured.count() == 12
    assert cured.select("event_id").distinct().count() == 12
    # ... keeping the EARLIEST row per id (the original, not the rewrite)
    kept = {r.event_id: r.event_type for r in cured.collect()}
    assert all(v == "view" for v in kept.values())


@pytest.fixture(scope="module")
def unicode_docs_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("unidocs")
    texts = [
        "plain ascii words",
        "nbsp separated words",
        "thin space and em space",
        "line sep and para sep",
        "zero​width​joined",
        "rtl שלום mixed",
        "combining é accent",
        "tab\tand\nnewline mix",
        "ideographic　space",
        "emoji \U0001f389 and \U0001f469‍\U0001f469‍\U0001f467 family",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


def test_every_documents_query_agrees_on_unicode_chaos(
    spark, unicode_docs_dir
):
    """Unicode whitespace variants (NBSP, thin/em/ideographic space,
    line/para separators), zero-width joiners, RTL text, combining
    marks, and astral-plane emoji across every documents-only query.
    Both engines' \\s classes are ASCII-leaning in the same way, so
    tokenization agrees — the one defect found was the audio-chunk
    oracle sampling CODEPOINTS (ascii('emoji') = 127881) where the
    fake's contract is UTF-8 BYTES; its oracle now iterates hex pairs
    of the encoded blob."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{unicode_docs_dir}/documents.parquet/*.parquet')"
    )
    reg = registry()
    bad = []
    for name in _documents_only_queries():
        qd = reg[name]
        try:
            got = qd.spark(spark, unicode_docs_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)


@pytest.fixture(scope="module")
def mixed_dim_dir(spark, tmp_path_factory):
    """sf0.001 embeddings with three corrupted dimensions: a truncated
    vector (10), a doubled vector (128), and a dim-1 vector."""
    tmp = tmp_path_factory.mktemp("mixeddim")
    src = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).toPandas()
    src.at[src.index[5], "embedding"] = src.iloc[5]["embedding"][:10]
    src.at[src.index[6], "embedding"] = list(src.iloc[6]["embedding"]) * 2
    src.at[src.index[7], "embedding"] = [1.0]
    spark.createDataFrame(src).write.mode("overwrite").parquet(
        str(tmp / "embeddings.parquet")
    )
    return str(tmp), len(src.iloc[0]["embedding"])


def test_dimension_contract_audit_and_cure(spark, mixed_dim_dir):
    """The dimension contract (r7 mixed-dim probe: 18 of 24 vector
    queries corrupt or crash on 3 wrong-dim rows — zip_with silently
    truncates to the shorter length, index access ANSI-crashes):
    `emb_dim_audit` is the detection gate, `vectors(dim=modal)` the
    cure. The audit is oracle-verified on the corrupt fixture; the
    cure must drop exactly the corrupted rows."""
    sf_dir, dim = mixed_dim_dir
    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.tables import vectors

    qd = registry()["emb_dim_audit"]
    got = qd.spark(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(qd.oracle).fetchdf()
    gs = got.sort_values("dim").reset_index(drop=True)
    ws = want.sort_values("dim").reset_index(drop=True)
    assert gs[["dim", "n", "is_modal", "frac_r"]].astype(str).equals(
        ws[["dim", "n", "is_modal", "frac_r"]].astype(str)
    )
    # the audit's semantics: modal dim is the true one, 3 rows off-dim
    modal = gs[gs.is_modal].iloc[0]
    assert modal.dim == dim
    assert int(gs[~gs.is_modal].n.sum()) == 3
    # the cure: enforcement drops exactly the corrupted rows
    cured = vectors(spark, sf_dir, dim=dim)
    assert cured.count() == int(modal.n)
    assert cured.filter(f"size(embedding) <> {dim}").count() == 0


def test_duplicate_doc_ids_detected_curable_and_row_aligned(spark, tmp_path):
    """doc_id is the documents PK. The r7 duplicate-doc_id probe (full
    504-row sweep, /tmp scratch): 69/71 documents-only queries agree
    cross-engine on a violated PK; corpus_full_curation and
    text_rrf_fusion legitimately diverge (keep-first and rank fusion
    are ambiguous per duplicated id) — and multimodal_image_profile
    was silently MULTIPLYING rows (decode profile re-joined on the
    non-unique id: k duplicates -> k² rows; now a passthrough through
    the decode UDF). Contract mirrors events: detect via
    dq_constraint_report's documents_pk_dups, cure via keep-first."""
    import duckdb as _duck

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from social_and_media_data_ingestion_spark.plans.tables import t as load_t

    rows = [(i, f"document number {i} alpha beta", "en", "src0", 20)
            for i in range(12)]
    rows.append((1, "document number 1 alpha beta", "en", "src0", 20))  # replay
    rows.append((2, "conflicting replacement text", "de", "src1", 28))  # rewrite
    rows.append((3, "document number 3 alpha beta", "en", "src0", 20))
    rows.append((3, "document number 3 alpha beta", "en", "src0", 20))  # triple
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    # minimal valid frames for the DQ report's other scans
    spark.createDataFrame(
        [(1, 1, "O", 10.0, "1996-01-02", "1-URGENT", "c", 0, "x")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "Customer#1", "addr", 1, "p", 0.0, "s", "c")],
        "c_custkey bigint, c_name string, c_address string, "
        "c_nationkey bigint, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1, 1, 1, 5.0, 100.0, 0.1, 0.02, "N", "O",
          "1996-03-13", "1996-02-12", "1996-03-22", "D", "T", "c")],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string, l_commitdate string, "
        "l_receiptdate string, l_shipinstruct string, l_shipmode string, "
        "l_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import datetime as dt
    spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1, 10, 0), 0, "view", 1.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # DETECT: 4 extra rows on 12 distinct ids
    report = {
        r.check_id: (r.metric, r.passed)
        for r in registry()["dq_constraint_report"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert report["documents_pk_dups"] == (4.0, False)
    # CURE: keep-first per doc_id (n_chars then text as the stable
    # tie-break on exact replays)
    docs = load_t(spark, str(tmp_path), "documents")
    w = Window.partitionBy("doc_id").orderBy(F.asc("n_chars"), F.asc("text"))
    cured = (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert cured.count() == 12
    # ROW-ALIGNED: the decode profile emits exactly one row per INPUT
    # row even with duplicate ids, and still hash-matches its oracle
    qd = registry()["multimodal_image_profile"]
    got = qd.spark(spark, str(tmp_path)).toPandas()
    assert len(got) == 16  # 12 + 4 duplicates, NOT 12 + k² blowup
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = con.execute(qd.oracle).fetchdf()
    key = ["media_id", "n_bytes", "width", "height", "channels"]
    gs = got[key].astype(str).sort_values(key).reset_index(drop=True)
    ws = want[key].astype(str).sort_values(key).reset_index(drop=True)
    assert gs.equals(ws)


# the 7 vector queries that legitimately violate the finite-inputs
# contract (SCALE.md §8) — each fails or diverges on NON-FINITE
# components by engine design, which is exactly why emb_nonfinite_audit
# exists as the ingestion gate:
#   emb_dim_variance      DuckDB VARSAMP overflows on inf
#   emb_pca_top_component driver-side power iteration: NaN -> int fails
#   emb_quantize_int8     Spark floor(NaN·scale) wraps to LONG garbage
#                         where DuckDB refuses the cast (r7 precedent)
#   sim_int8_topk         same quantize path
#   emb_pq_topk/recall    NaN distances re-rank per engine NaN ordering
#   sim_retrieval_mrr     NaN cosine re-ranks the hit list per engine
NONFINITE_EXEMPT = {
    "emb_dim_variance",
    "emb_pca_top_component",
    "emb_pq_recall",
    "emb_pq_topk",
    "emb_quantize_int8",
    "sim_int8_topk",
    "sim_retrieval_mrr",
}


@pytest.fixture(scope="module")
def nonfinite_embeddings_dir(spark, tmp_path_factory):
    import numpy as np

    tmp = tmp_path_factory.mktemp("nonfinemb")
    rng = np.random.RandomState(11)
    nan, inf = float("nan"), float("inf")
    rows = []
    for vid in range(40):
        emb = [float(round(x, 3)) for x in rng.randn(16)]
        if vid % 7 == 0:
            emb[3] = nan  # one poisoned component
        elif vid % 7 == 1:
            emb[0] = inf
        elif vid % 7 == 2:
            emb[5] = -inf
        elif vid % 7 == 3:
            emb = [nan] * 16  # fully poisoned vector
        rows.append((vid, emb, None if vid % 5 == 0 else vid % 4))
    # RAW rows, never pandas: pandas createDataFrame silently turns NaN
    # into NULL and the fixture stops testing anything (r7 gotcha)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_vector_queries_on_nonfinite_components(
    spark, nonfinite_embeddings_dir
):
    """NaN/±Inf COMPONENTS inside otherwise-valid vectors (the
    valid-vector contract screens NULL/empty/zero-norm but NOT
    non-finite). Every vector query outside the documented exempt set
    must agree with its oracle; emb_nonfinite_audit — the ingestion
    gate those exemptions rely on — must flag every poisoned-vector
    class in BOTH engines."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{nonfinite_embeddings_dir}/embeddings.parquet/*.parquet')"
    )
    reg = registry()
    names = [
        n for n in _embeddings_only_queries() if n not in NONFINITE_EXEMPT
    ]
    assert "emb_nonfinite_audit" in names
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, nonfinite_embeddings_dir).toPandas()
            want = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        gs = (
            got[sorted(got.columns)]
            .astype(str)
            .sort_values(sorted(got.columns))
            .reset_index(drop=True)
        )
        ws = (
            want[sorted(want.columns)]
            .astype(str)
            .sort_values(sorted(want.columns))
            .reset_index(drop=True)
        )
        if len(gs) != len(ws) or not gs.equals(ws):
            bad.append(f"{name}: value/rowcount divergence")
    assert not bad, "\n".join(bad)
    # the audit actually SEES the poison: 40 vectors; vid%7 in {0,3}
    # carry NaN (one component / all 16), vid%7 in {1,2} carry ±inf —
    # counts recomputed from the construction below
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        emb_nonfinite_audit,
    )

    tot = (
        emb_nonfinite_audit(spark, nonfinite_embeddings_dir)
        .groupBy()
        .sum("n_vectors", "n_with_nan", "n_with_inf", "nan_components")
        .first()
    )
    assert tot[0] == 40
    n_nan_vecs = sum(1 for v in range(40) if v % 7 in (0, 3))
    n_inf_vecs = sum(1 for v in range(40) if v % 7 in (1, 2))
    nan_comps = sum(16 if v % 7 == 3 else 1 for v in range(40) if v % 7 in (0, 3))
    assert tot[1] == n_nan_vecs
    assert tot[2] == n_inf_vecs
    assert tot[3] == nan_comps
