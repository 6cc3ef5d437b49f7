"""Operational robustness at lake scale: schema evolution across file
generations and corrupt-file tolerance — the two failure modes a
multi-year landing zone actually produces (upstream writers add
columns; object stores deliver truncated objects)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_schema_evolution_merge(spark, tmp_path):
    """Older files lack a column newer files have: mergeSchema reads must
    union the schemas and null-fill the missing column, keeping every
    row from both generations."""
    out = str(tmp_path / "evolving")
    gen1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    gen1.write.parquet(out + "/g1")
    gen2 = spark.createDataFrame(
        [(3, "c", 1.5), (4, "d", 2.5)], ["id", "v", "score"]
    )
    gen2.write.parquet(out + "/g2")
    back = spark.read.option("mergeSchema", "true").parquet(
        out + "/g1", out + "/g2"
    )
    assert set(back.columns) == {"id", "v", "score"}
    rows = {r.id: (r.v, r.score) for r in back.collect()}
    assert rows[1] == ("a", None) and rows[3] == ("c", 1.5)
    assert len(rows) == 4


def test_corrupt_file_skipped_when_configured(spark, tmp_path):
    """A truncated/garbage object alongside valid parquet must not kill
    the scan when ignoreCorruptFiles is on — and must keep every valid
    row. (The per-file analog of the NDJSON corrupt-line skip.)"""
    out = tmp_path / "mixed"
    out.mkdir()
    good = spark.createDataFrame([(1, "ok"), (2, "fine")], ["id", "v"])
    good.write.parquet(str(out / "good"))
    (out / "good" / "part-junk.parquet").write_bytes(b"not a parquet file")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        back = spark.read.parquet(str(out / "good"))
        got = {r.id for r in back.collect()}
        assert got == {1, 2}
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_missing_column_select_fails_cleanly(spark, tmp_path):
    """Selecting a column that no generation has must raise an
    AnalysisException at plan time, not return garbage."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    p = str(tmp_path / "plain")
    spark.createDataFrame([(1,)], ["id"]).write.parquet(p)
    with pytest.raises(AnalysisException):
        spark.read.parquet(p).select(F.col("nope")).collect()


def test_text_queries_on_pathological_documents(spark, tmp_path):
    """Registry text/dedup queries vs their DuckDB oracles on a
    synthetic documents table full of edge cases the generated testdata
    never contains: empty text, whitespace-only, single token, one
    token repeated, unicode, and a doc that is pure boilerplate. Both
    engines must agree on rowcount AND values — the same contract the
    driver gate enforces, but on adversarial inputs."""
    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry

    texts = [
        (0, "", "en", "src0"),
        (1, "   ", "en", "src0"),
        (2, "solo", "en", "src1"),
        (3, "dup dup dup dup dup dup", "en", "src1"),
        (4, "Ünïcode tökens mit Umläuten größer", "de", "src2"),
        (5, "a b", "en", "src2"),  # below 3-gram threshold
        (6, "the quick brown fox jumps over the lazy dog", "en", "src3"),
        (7, "the quick brown fox jumps over the lazy dog", "en", "src4"),
        (8, "quick brown fox jumps over the lazy", "en", "src4"),
    ]
    pdf = pd.DataFrame(texts, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    reg = registry()
    names = [
        "dedup_shingle_containment",
        "dedup_fingerprint",
        "text_chunk_documents",
        "text_shingles_3gram",
        "text_bigram_logprob",
        "corpus_dedup_rate_by_source",
        "text_boilerplate_fraction",
    ]
    for name in names:
        qd = reg[name]
        got = qd.spark(spark, str(tmp_path)).toPandas()
        want = con.execute(qd.oracle).fetchdf()
        assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
        gs = got[sorted(got.columns)].copy()
        ws = want[sorted(want.columns)].copy()
        for c in gs.columns:
            gs[c] = gs[c].astype(str)
            ws[c] = ws[c].astype(str)
        gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
        ws = ws.sort_values(list(ws.columns)).reset_index(drop=True)
        assert gs.equals(ws), f"{name}: value mismatch\n{gs}\n{ws}"


def test_event_queries_deterministic_under_timestamp_ties(spark, tmp_path):
    """Window/session/sequence queries vs their oracles on an events
    table with 6-way TIMESTAMP TIES per minute and duplicated values:
    every rank/lag/sessionize tie-break must be total (engine-agnostic),
    or Spark and DuckDB would legally return different rows. The
    generated testdata has near-unique timestamps, so only this harness
    exercises the tie paths."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for k in range(30):
            ts = dt.datetime(2024, 1, 1, 12, k // 6, 0)  # 6-way ties
            rows.append(
                (eid, ts, u, ["view", "click", "purchase"][k % 3],
                 float(k % 5), "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    reg = registry()
    names = [
        "events_sessionize",
        "events_session_window",
        "window_lag_delta",
        "events_windowed_agg",
        "events_repeat_runs",
        "events_markov_stationary",
        "events_trigram_paths",
        "scd2_user_state_history",
        # round-6 widening after the scd2 tie bug: the remaining
        # tie-sensitive families (as-of joins, sequences, concurrency,
        # time-weighted integrals, streaks). A one-off sweep verified
        # ALL 56 events-only registry queries under this harness; these
        # representatives keep the families pinned in CI.
        "j9_asof_view_purchase",
        "j10_asof_tolerance_1h",
        "j11_asof_nearest_purchase",
        "events_transition_matrix",
        "events_funnel_conversion",
        "events_max_concurrent",
        "events_time_weighted_avg",
        "j5_asof_last_login",
        "events_cumulative_distinct_users",
    ]
    for name in names:
        qd = reg[name]
        got = qd.spark(spark, str(tmp_path)).toPandas()
        want = con.execute(qd.oracle).fetchdf()
        assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
        gs = got[sorted(got.columns)].astype(str)
        ws = want[sorted(want.columns)].astype(str)
        gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
        ws = ws.sort_values(list(ws.columns)).reset_index(drop=True)
        assert gs.equals(ws), f"{name}: tie-break divergence\n{gs}\n{ws}"


def test_naive_bayes_integer_scores_tiebreak_deterministic(spark, tmp_path):
    """Round-6 NB rewrite contract on adversarial inputs: two classes
    trained on IDENTICAL token streams produce exactly equal BIGINT
    scores for every test doc (integer arithmetic makes the tie exact,
    not a float coincidence), so the argmax must fall through to the
    source-ascending tie-break identically on both engines. Also mixes
    in: a test doc of entirely-unseen tokens (pure lpd-mass scoring), a
    whitespace-only test doc (must drop from scoring on both sides),
    and a third class with a genuinely different distribution."""
    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry

    # (doc_id // 20) % 2 == 0 -> train block; == 1 -> test block
    rows = []
    # train: classes a_src and b_src identical; c_src distinct
    for i, txt in enumerate(["alpha beta gamma", "alpha beta", "gamma gamma"]):
        rows.append((0 + i, txt, "en", "a_src"))
        rows.append((5 + i, txt, "en", "b_src"))
    for i, txt in enumerate(["delta delta epsilon", "delta zeta"]):
        rows.append((10 + i, txt, "en", "c_src"))
    # test block (ids 20-39)
    rows += [
        (20, "alpha beta gamma", "en", "a_src"),  # tie a/b -> a_src wins
        (21, "alpha gamma gamma", "en", "b_src"),  # tie a/b -> predicted a_src
        (22, "delta epsilon", "en", "c_src"),  # clearly c
        (23, "never seen tokens only", "en", "a_src"),  # all-unseen mass
        (24, "   ", "en", "b_src"),  # empty after tokenize: dropped
        (25, "alpha delta", "en", "c_src"),  # mixed evidence
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    qd = registry()["ml_naive_bayes_source"]
    got = qd.spark(spark, str(tmp_path)).toPandas()
    want = con.execute(qd.oracle).fetchdf()
    assert len(got) == len(want)
    gs = got[sorted(got.columns)].astype(str)
    ws = want[sorted(want.columns)].astype(str)
    gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
    ws = ws.sort_values(list(ws.columns)).reset_index(drop=True)
    assert gs.equals(ws), f"engine divergence\n{gs}\n{ws}"
    # the doc-24 drop: 5 scored test docs across 3 actual classes
    assert int(got["n_test"].sum()) == 5
    # tie fell to a_src: doc 20 counts correct for a_src, doc 21 does
    # NOT count correct for b_src (predicted a_src on equal scores)
    per = {r["source"]: (r["n_test"], r["n_correct"]) for _, r in got.iterrows()}
    # doc 20: equal a/b scores -> source-asc tie-break predicts a_src
    # (correct); doc 23 (all-unseen tokens) goes to c_src — the
    # smallest (tot+v) class wins pure default-mass scoring
    assert per["a_src"] == (2, 1)
    assert per["b_src"][1] == 0  # doc 21 lost to the a_src tie-break


def test_er_phonetic_queries_on_pathological_names(spark, tmp_path):
    """The two phonetic-blocking ER queries vs their DuckDB oracles on a
    synthetic part table of adversarial names: empty, whitespace,
    digits-only (base collapses to ''), single letters, all-vowel words
    (key = first letter only), vowel-only spelling variants (MUST share
    a block — the point of phonetic blocking), case/punctuation noise,
    and a long repeated-consonant name (run-collapse path). Both
    engines must agree on rowcount AND values."""
    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry

    names = [
        "",  # empty -> key ''
        "   ",  # whitespace-only -> key ''
        "12345",  # digits strip to '' -> key ''
        "x",  # single letter, no digits
        "aeiou",  # all vowels -> key 'a'
        "smith",  # s53
        "smyth",  # vowel variant: same block as smith
        "SMITH!!",  # case+punct noise: same block as smith
        "smitthh",  # repeated consonants collapse into smith's block
        "schmidt",  # different code (extra consonants)
        "bbbbbbbb",  # long consonant run -> single digit after collapse
        "red widget",
        "rad widget",  # vowel variant of 'red widget'
    ]
    rows = [(i, n) for i, n in enumerate(names) for _ in range(i % 2 + 1)]
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{tmp_path}/part.parquet/*.parquet')"
    )
    reg = registry()
    for name in [
        "er_phonetic_blocked_pairs",
        "er_phonetic_block_audit",
        "er_entity_clusters",
        "er_blocking_recall_audit",
    ]:
        qd = reg[name]
        got = qd.spark(spark, str(tmp_path)).toPandas()
        want = con.execute(qd.oracle).fetchdf()
        assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
        gs = got[sorted(got.columns)].copy()
        ws = want[sorted(want.columns)].copy()
        for c in gs.columns:
            gs[c] = gs[c].astype(str)
            ws[c] = ws[c].astype(str)
        gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
        ws = ws.sort_values(list(ws.columns)).reset_index(drop=True)
        assert gs.equals(ws), f"{name}: value mismatch\n{gs}\n{ws}"
    # the vowel variants really did land in one block and got verified
    pairs = reg["er_phonetic_blocked_pairs"].spark(spark, str(tmp_path))
    matched = {(r.name1, r.name2) for r in pairs.collect()}
    assert ("smith", "smyth") in matched
    assert ("rad widget", "red widget") in matched
    # clustering merges TRANSITIVELY over string node ids: smith ~
    # smyth and smith ~ smitthh coalesce all three into one entity
    # labeled by the lexicographic-min member. 'SMITH!!' shares their
    # BLOCK (key strips case/punct) but the case-sensitive Levenshtein
    # verify correctly rejects it (distance 7), so it stays a singleton
    # entity -- blocking recall and verify precision are separate dials.
    clusters = {
        r.entity_id: r.n_members
        for r in reg["er_entity_clusters"].spark(spark, str(tmp_path)).collect()
    }
    assert clusters["smith"] == 3  # smith + smyth + smitthh
    assert clusters["SMITH!!"] == 1  # blocked together, verified apart


def test_srm_flag_fires_on_imbalanced_assignment(spark, tmp_path):
    """The r7 vacuous-coverage audit: events_srm_check's srm_flag is
    False on every generated sf (assignment is genuinely balanced), so
    the gate never exercised the ALARM branch. This fixture picks user
    ids that all hash into arm 0 under the rendezvous split, so a real
    sample-ratio mismatch fires the flag — on BOTH engines."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import _RDV_P

    arm0 = [
        u for u in range(200)
        if ((u % _RDV_P) * 2654435761 + 104729) % _RDV_P % 2 == 0
    ][:12]
    assert len(arm0) == 12
    rows = [
        (i, dt.datetime(2024, 1, 1, 10, i), uid, "view", 1.0, None)
        for i, uid in enumerate(arm0)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    qd = registry()["events_srm_check"]
    got = qd.spark(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.execute(qd.oracle).fetchdf()
    assert got.astype(str).equals(want.astype(str))
    r = got.iloc[0]
    assert r.n == 12 and r.arm0 == 12 and r.arm1 == 0
    assert bool(r.srm_flag) is True  # chi2 = 12 >> 3.841: the alarm fires
