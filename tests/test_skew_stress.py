"""Skew-stress harness (round 11) — the next adversarial probe in the
r7-r10 lineage (nulls → empty/one-row → dup-PK → hostile docs/names →
non-finite → SKEW): every documents-only and events-only registry
query runs against tables with a pathologically hot key — one token in
over half the corpus, thirty verbatim-identical documents (one LSH
bucket far past any cap), one user_id holding half the event stream,
one event_type at 70% — Spark vs its DuckDB oracle, value-compared.
At 100 TB a hot key is not an edge case, it IS the workload (stopwords,
boilerplate, bot accounts); a query whose answer drifts or whose plan
degenerates under skew fails here first.

Beyond the sweep, the hot-set guards are probed DIRECTLY:
- the LSH hot-bucket cap must reroute an over-cap bucket through the
  banded self-join WITHOUT changing the candidate set;
- _pruned_postings must drop boilerplate shingles before any posting
  list is collected, so every buffered list stays <= max_df;
- containment_pairs under max_df must stay sub-quadratic on a corpus
  glued together by one ubiquitous shingle while still pairing the
  genuinely-overlapping docs;
- the session AQE skew-join rescue must actually be on.
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
def skew_docs_dir(spark, tmp_path_factory):
    """120 documents: 'hot' appears (several times) in 60% of docs, 30
    docs are verbatim-identical boilerplate (one fingerprint, one LSH
    bucket, ubiquitous shingles), the rest carry distinct vocabulary so
    rare-term statistics still exist."""
    tmp = tmp_path_factory.mktemp("skewdocs")
    texts = []
    for i in range(120):
        if i % 4 == 0:  # 30 identical boilerplate docs
            texts.append("hot boiler plate hot boiler plate hot end")
        elif i % 5 != 2:  # hot token riding along distinct content
            texts.append(
                f"hot word{i} token{i % 17} hot filler{i % 7} hot tail{i}"
            )
        else:  # the cold minority
            texts.append(f"unique{i} rare{i % 13} phrase{i} quiet{i % 3}")
    docs = pd.DataFrame(
        {
            "doc_id": range(120),
            "text": texts,
            "lang": [["en", "de", "fr"][i % 3] for i in range(120)],
            "source": [f"src{i % 2}" for i in range(120)],  # 2 hot sources
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


@pytest.fixture(scope="module")
def skew_events_dir(spark, tmp_path_factory):
    """200 events: user 7 owns 50% of the stream, 'view' is 70% of all
    types, and half of everything lands inside one hour of one day."""
    import datetime as dt

    tmp = tmp_path_factory.mktemp("skewevents")
    rows = []
    for eid in range(200):
        user = 7 if eid % 2 == 0 else eid % 23
        etype = "view" if eid % 10 < 7 else ["click", "purchase", "view"][eid % 3]
        if eid % 2 == 0:  # temporal hot spot
            ts = dt.datetime(2024, 3, 1, 12, eid % 60, eid % 60)
        else:
            ts = dt.datetime(2024, 3, 1 + eid % 21, eid % 24, eid % 60, 0)
        rows.append((eid, ts, user, etype, float(eid % 97), '{"k": 1}'))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    return str(tmp)


def _single_table_queries(table: str, skip: set[str] = frozenset()):
    others = [t for t in OTHER_TABLES if t != table] + (
        ["documents"] if table != "documents" else []
    )
    out = []
    for name, qd in registry().items():
        if qd.oracle is None or name in skip:
            continue
        o = qd.oracle.lower()
        if table not in o:
            continue
        if any(re.search(rf"\b{t}\b", o) for t in others):
            continue
        if name.startswith("stream_"):
            continue
        out.append(name)
    return out


def _sweep(spark, reg, names, sf_dir, con):
    bad = []
    for name in names:
        qd = reg[name]
        try:
            got = qd.spark(spark, sf_dir).toPandas()
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
    return bad


def test_every_documents_query_agrees_on_hot_token_corpus(
    spark, skew_docs_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{skew_docs_dir}/documents.parquet/*.parquet')"
    )
    reg = registry()
    names = _single_table_queries("documents", skip={"sql_passthrough_agg"})
    assert len(names) >= 65  # broad sweep, not a cherry-pick
    bad = _sweep(spark, reg, names, skew_docs_dir, con)
    assert not bad, "\n".join(bad)


def test_every_events_query_agrees_on_hot_user_stream(
    spark, skew_events_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_events_dir}/events.parquet/*.parquet')"
    )
    reg = registry()
    names = _single_table_queries(
        "events", skip={"agg_quantile_sketch_audit"}
    )
    assert len(names) >= 40
    bad = _sweep(spark, reg, names, skew_events_dir, con)
    assert not bad, "\n".join(bad)


def test_lsh_hot_bucket_guard_reroutes_without_changing_pairs(spark):
    """40 verbatim-identical docs concentrate one (band, bucket) far
    past the cap. With max_bucket=8 the 40-member bucket CANNOT take
    the in-row expansion path (it only serves buckets <= 8), so every
    one of the C(40,2) pairs must arrive via the hot-branch self-join —
    and the candidate set must be exactly what an uncapped run yields.
    The guard changes the ROUTE, never the answer."""
    from social_and_media_data_ingestion_spark.operators import dedup as D

    rows = [(i, "alpha beta gamma delta epsilon zeta eta") for i in range(40)]
    rows += [(100 + i, f"cold{i} text{i} words{i} here{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.minhash_signatures(df, "doc_id", "text", n=3, num_hashes=8)
    capped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(
            sigs, bands=4, rows_per_band=2, max_bucket=8
        ).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(
            sigs, bands=4, rows_per_band=2, max_bucket=100000
        ).collect()
    }
    dup_pairs = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert dup_pairs <= capped  # the hot bucket's pairs all survive
    assert capped == uncapped  # the cap never changes the answer


def test_pruned_postings_drop_hot_shingles_before_collection(spark):
    """50 docs share one boilerplate shingle; with max_df=4 the hot
    shingle must vanish from the postings (it would otherwise buffer a
    50-element list in ONE aggregation buffer — the OOM vector) and
    every surviving posting list must be <= max_df long."""
    from pyspark.sql import functions as F

    from social_and_media_data_ingestion_spark.operators import dedup as D

    rows = [(i, f"common boiler plate unique{i} tail{i} words{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = D.word_shingles(df, "doc_id", "text", 3)
    postings = D._pruned_postings(sh, max_df=4)
    got = postings.select(
        "shingle", F.size("ids").alias("n")
    ).collect()
    assert got, "rare shingles must survive the guard"
    assert all(r.n <= 4 for r in got)
    assert all("common boiler plate" != r.shingle for r in got)


def test_containment_bounded_under_ubiquitous_shingle(spark):
    """A corpus glued together by one shingle in EVERY doc: max_df
    keeps candidate generation on the rare-shingle universe, so the
    only surviving pair is the genuinely duplicated pair — never the
    quadratic all-pairs the hot shingle implies."""
    from social_and_media_data_ingestion_spark.operators import dedup as D

    rows = [(i, f"glue glue glue body{i} text{i} unique{i}") for i in range(30)]
    rows += [(100, "glue glue glue same same same"), (101, "glue glue glue same same same")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in D.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.5, max_df=8
        ).collect()
    }
    assert pairs == {(100, 101)}


def test_aqe_skew_join_rescue_is_on(spark):
    """The runtime skew-split is the last-resort guard for joins whose
    keys we cannot pre-salt; the engine session must keep it enabled."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
