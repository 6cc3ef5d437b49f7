"""Behavioral tests for the ext5 operators against pure-Python
reference implementations: k-core peeling vs a dict-based peeler on
random graphs, containment vs brute-force set arithmetic, and the two
properties that make rendezvous hashing worth shipping — balance and
minimal key movement when a shard leaves."""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators.dedup import containment_pairs
from social_and_media_data_ingestion_spark.operators.graph import kcore_peel

_RDV_P = 2147483647
_RDV_AB = [
    (1103, 12345),
    (97, 1013904223),
    (48271, 16807),
    (69621, 104729),
    (31337, 271828),
    (75321, 654321),
    (65539, 998244353),
    (22695477, 1),
]


def _py_kcore(edges, k, rounds):
    """Reference peeler on a canonical undirected edge set."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    stats = []
    for r in range(1, rounds + 1):
        deg = defaultdict(int)
        for a, b in e:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in keep and b in keep}
        stats.append((r, len(keep), len(e)))
    return stats


def test_kcore_matches_reference_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(60, 140))
        ]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = sorted(
            (r["round"], r["n_nodes"], r["n_edges"])
            for r in kcore_peel(df, k=3, rounds=3).collect()
        )
        assert got == _py_kcore(edges, 3, 3), f"trial {trial}"


def _py_containment(texts, n=2, threshold=0.5):
    sh = {
        i: {
            " ".join(toks[j : j + n])
            for j in range(len(toks) - n + 1)
        }
        for i, t in enumerate(texts)
        for toks in [t.lower().split()]
        if len(t.split()) >= n
    }
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            ca, cb = inter / len(sh[a]), inter / len(sh[b])
            if max(ca, cb) >= threshold:
                out[(a, b)] = (round(ca, 6), round(cb, 6))
    return out


def test_containment_matches_bruteforce(spark):
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 12)))
        for _ in range(30)
    ]
    # plant a verbatim-excerpt pair: doc 30 is a prefix of doc 31
    texts.append("alpha beta gamma delta")
    texts.append("alpha beta gamma delta eps alpha beta eps gamma")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            round(r["containment_ab"], 6),
            round(r["containment_ba"], 6),
        )
        for r in containment_pairs(
            df, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    want = _py_containment(texts, n=2, threshold=0.5)
    assert got == want
    assert (30, 31) in got  # the planted excerpt pair is caught


def test_containment_hot_shingle_guard_bounds_candidates(spark):
    """A corpus where every document shares one boilerplate line must
    NOT turn the inverted-index self-join quadratic: with the df cap on,
    the boilerplate shingles (df = n_docs > max_df) are dropped before
    candidate generation, so the only pairs that survive are ones
    sharing RARE shingles. Same failure mode — and same guard shape —
    as the >4096 hot-bucket cap on the LSH path."""
    boiler = "subscribe to our newsletter for daily updates today"
    n_docs = 120
    texts = [f"{boiler} unique{i}a unique{i}b unique{i}c" for i in range(n_docs)]
    # one genuinely near-dup pair via a shared RARE tail
    texts.append(f"{boiler} shared rare tail only here")
    texts.append(f"{boiler} shared rare tail only here extra")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    capped = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_df=8
    ).collect()
    # without the guard the boilerplate alone makes every pair a
    # candidate AND pushes its containment over threshold -> O(n^2) rows
    uncapped_count = containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_df=None
    ).count()
    assert uncapped_count >= (n_docs * (n_docs - 1)) // 2
    # guarded: only the rare-tail pair survives; candidates stay linear
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(n_docs, n_docs + 1)}


def _rdv_shard(key, shards):
    mixed = ((key % _RDV_P) * 2654435761 + 104729) % _RDV_P
    weights = [(a * mixed + b) % _RDV_P for a, b in _RDV_AB]
    best = max(weights[s] for s in shards)
    for s in shards:  # lowest index wins ties, like list_position
        if weights[s] == best:
            return s
    raise AssertionError


def test_rendezvous_balance_and_minimal_movement(spark):
    keys = list(range(2000))
    full = {k: _rdv_shard(k, range(8)) for k in keys}
    counts = defaultdict(int)
    for s in full.values():
        counts[s] += 1
    # balance: every shard populated, none more than 2.5x the mean
    assert len(counts) == 8
    assert max(counts.values()) <= 2.5 * (len(keys) / 8)
    # minimal movement: drop shard 3 — ONLY its keys may move
    for k in keys:
        new = _rdv_shard(k, [s for s in range(8) if s != 3])
        if full[k] != 3:
            assert new == full[k], f"key {k} moved without its shard dying"


def test_rendezvous_query_matches_python_model(spark):
    from social_and_media_data_ingestion_spark.plans.queries import registry

    rows = (
        registry()["sample_rendezvous_shards"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    got = {r["shard"]: r["n_docs"] for r in rows}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = defaultdict(int)
    for k in ids:
        want[_rdv_shard(k, range(8))] += 1
    assert got == dict(want)


def test_theil_sen_even_pair_count_matches_oracle(spark, tmp_path):
    """4 distinct days -> 6 pairwise slopes (EVEN k): the median must
    average the two middle slopes. Guards the floor-division spelling —
    plain `/` on longs is DOUBLE division in Spark, and `rn == (k+1)/2`
    silently never matches the lower-middle position for even k."""
    import datetime as dt

    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry

    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 5), (3, 2), (4, 9)]:
        for _ in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12, 0, 0),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "sf_even")
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    d = registry()["stats_theil_sen_trend"]
    got = {
        r["event_type"]: (r["n_pairs"], r["ts_slope"])
        for r in d.spark(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(d.oracle).fetchall()
    }
    assert got == want
    # daily counts (1,5,2,9) at days (0,1,2,3) -> slopes
    # [4, 0.5, 8/3, -3, 2, 7]; sorted middle pair (2, 8/3) -> 2.333333
    assert got["click"] == (6, 2.333333)


def test_er_linkage_single_token_name_blocks_as_empty(spark, tmp_path):
    """A part name WITHOUT a space must behave identically in both
    engines (round-4 advisor item): DuckDB's split_part(name,' ',2)
    yields '' while Spark's split().getItem(1) yields NULL — the Spark
    side now coalesces to '', so single-token names pair up inside the
    '' block instead of silently dropping out of the equi-join. Runs
    the REGISTRY query and its DuckDB oracle on a synthetic part table
    containing single-token names, and compares results."""
    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry

    rows = [
        (1, "solo"),
        (2, "solos"),  # lev("solo","solos")=1, same '' block
        (3, "azure metallic"),
        (4, "azures metallic"),  # same 'metallic' block, lev=2
        (5, "unrelated thing"),
    ]
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    qd = registry()["er_blocked_name_linkage"]
    got = {
        (r["name1"], r["name2"], r["noun"], r["lev"])
        for r in qd.spark(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{tmp_path}/part.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1], r[2], r[3])
        for r in con.execute(qd.oracle).fetchall()
    }
    assert got == want
    assert ("solo", "solos", "", 1) in got  # the '' block pair survives
