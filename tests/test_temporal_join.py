"""Temporal joins (operators/temporal_join.py) vs a brute-force model,
plus the plan-shape guards that make them scale-legal: no
BroadcastNestedLoopJoin / CartesianProduct anywhere."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from social_and_media_data_ingestion_spark.operators.temporal_join import (
    asof_join,
    time_band_join,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _frames(spark, seed=7, n_probe=300, n_ref=120, n_keys=9):
    rng = random.Random(seed)
    probe = [
        (i, rng.randrange(n_keys), _ts(rng.uniform(0, 5000)))
        for i in range(n_probe)
    ]
    ref = [
        (rng.randrange(n_keys), _ts(rng.uniform(0, 5000)), round(rng.uniform(1, 100), 2))
        for _ in range(n_ref)
    ]
    # force some exact-equality instants (inclusive-match edge)
    ref.append((probe[0][1], probe[0][2], 555.0))
    p_schema = StructType(
        [
            StructField("pid", LongType()),
            StructField("k", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    r_schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", TimestampType()),
            StructField("v", DoubleType()),
        ]
    )
    return (
        spark.createDataFrame(probe, p_schema),
        spark.createDataFrame(ref, r_schema),
        probe,
        ref,
    )


def _model_asof(probe, ref, direction="backward", tol=None):
    out = {}
    for pid, k, pts in probe:
        if direction == "backward":
            cands = [(rts, v) for rk, rts, v in ref if rk == k and rts <= pts]
            best = max(cands) if cands else None
        else:
            cands = [(rts, v) for rk, rts, v in ref if rk == k and rts >= pts]
            best = min(cands) if cands else None
        if best is not None and tol is not None:
            if abs((pts - best[0]).total_seconds()) > tol:
                best = None
        out[pid] = best
    return out


def _run_asof(spark, direction, tol=None):
    p, r, probe, ref = _frames(spark)
    got = asof_join(
        p,
        r,
        on=["k"],
        probe_ts="ts",
        ref_ts="ts",
        value_cols=["v"],
        direction=direction,
        tolerance_seconds=tol,
    ).collect()
    want = _model_asof(probe, ref, direction, tol)
    assert len(got) == len(probe)
    for row in got:
        exp = want[row.pid]
        if exp is None:
            assert row.matched_ts is None and row.v is None, row
        else:
            assert row.matched_ts == exp[0] and row.v == exp[1], (row, exp)


def test_asof_backward_matches_bruteforce(spark):
    _run_asof(spark, "backward")


def test_asof_forward_matches_bruteforce(spark):
    _run_asof(spark, "forward")


def test_asof_tolerance_nulls_stale_matches(spark):
    _run_asof(spark, "backward", tol=120.0)


def test_asof_inner_drops_unmatched(spark):
    p, r, probe, ref = _frames(spark)
    got = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"], how="inner"
    ).collect()
    want = _model_asof(probe, ref)
    assert {row.pid for row in got} == {k for k, v in want.items() if v is not None}


def test_asof_tiebreak_largest_wins(spark):
    t0 = _ts(100)
    p = spark.createDataFrame([(1, 1, _ts(200))], ["pid", "k", "ts"])
    r = spark.createDataFrame(
        [(1, t0, 10.0, 1), (1, t0, 99.0, 2), (1, t0, 50.0, 0)],
        ["k", "ts", "v", "pref"],
    )
    got = asof_join(
        p,
        r,
        on=["k"],
        probe_ts="ts",
        ref_ts="ts",
        value_cols=["v"],
        ref_tiebreak="pref",
    ).collect()
    assert got[0].v == 99.0  # largest tiebreak wins deterministically


def test_asof_plan_has_no_nested_loop(spark):
    p, r, _, _ = _frames(spark)
    df = asof_join(p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # pure union + window: no join operator at all


def _model_band(probe, ref, band):
    pairs = set()
    for pid, pk, pts in probe:
        for j, (rk, rts, _) in enumerate(ref):
            if abs((pts - rts).total_seconds()) <= band:
                pairs.add((pid, j))
    return pairs


def test_band_join_matches_bruteforce_and_no_dupes(spark):
    p, r, probe, ref = _frames(spark, n_probe=150, n_ref=80)
    r_idx = r.withColumn("rid", F.monotonically_increasing_id())
    rows = r_idx.collect()
    ref_indexed = [(row.k, row.ts, row.v) for row in rows]
    got = time_band_join(p, r_idx, "ts", "ts", band_seconds=90.0).collect()
    # exactly-once: no (probe, ref) pair may repeat
    seen = [(row.p_pid, row.r_rid) for row in got]
    assert len(seen) == len(set(seen))
    rid_of = {i: rows[i].rid for i in range(len(rows))}
    want = {
        (pid, rid_of[j]) for pid, j in _model_band(probe, ref_indexed, 90.0)
    }
    assert set(seen) == want


def test_band_join_with_key_restricts_pairs(spark):
    p, r, probe, ref = _frames(spark, n_probe=100, n_ref=60)
    got = time_band_join(p, r, "ts", "ts", band_seconds=90.0, on=["k"]).collect()
    for row in got:
        assert row.p_k == row.r_k
        assert abs((row.p_ts - row.r_ts).total_seconds()) <= 90.0


def test_band_join_plan_is_equi_not_nested_loop(spark):
    p, r, _, _ = _frames(spark)
    df = time_band_join(p, r, "ts", "ts", band_seconds=60.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_band_join_boundary_inclusive(spark):
    p = spark.createDataFrame([(1, 0, _ts(100))], ["pid", "k", "ts"])
    r = spark.createDataFrame(
        [(0, _ts(40.0), 1.0), (0, _ts(160.0), 2.0), (0, _ts(160.000001), 3.0)],
        ["k", "ts", "v"],
    )
    got = time_band_join(p, r, "ts", "ts", band_seconds=60.0).collect()
    vs = sorted(row.r_v for row in got)
    assert vs == [1.0, 2.0]  # ±60 s inclusive; 60.000001 s excluded


def _model_nearest(probe, ref, tol=None, exact=True):
    out = {}
    for pid, k, pts in probe:
        best = None
        for rk, rts, v in ref:
            if rk != k:
                continue
            if not exact and rts == pts:
                continue
            gap = abs((pts - rts).total_seconds())
            if tol is not None and gap > tol:
                continue
            # backward (rts <= pts) wins exact-distance ties
            rank = (gap, 0 if rts <= pts else 1, -rts.timestamp())
            if best is None or rank < best[0]:
                best = (rank, rts, v)
        out[pid] = None if best is None else (best[1], best[2])
    return out


def test_asof_nearest_matches_bruteforce(spark):
    p, r, probe, ref = _frames(spark)
    got = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"],
        direction="nearest",
    ).collect()
    want = _model_nearest(probe, ref)
    for row in got:
        exp = want[row.pid]
        if exp is None:
            assert row.matched_ts is None and row.v is None, row
        else:
            assert row.matched_ts == exp[0], (row, exp)


def test_asof_nearest_with_tolerance(spark):
    p, r, probe, ref = _frames(spark)
    got = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"],
        direction="nearest", tolerance_seconds=50.0,
    ).collect()
    want = _model_nearest(probe, ref, tol=50.0)
    for row in got:
        exp = want[row.pid]
        if exp is None:
            assert row.matched_ts is None, row
        else:
            assert row.matched_ts == exp[0], (row, exp)


def test_asof_strict_excludes_equal_instant(spark):
    t0 = _ts(100)
    p = spark.createDataFrame([(1, 1, t0)], ["pid", "k", "ts"])
    r = spark.createDataFrame(
        [(1, t0, 9.0), (1, _ts(50), 5.0)], ["k", "ts", "v"]
    )
    incl = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"]
    ).collect()
    strict = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"],
        allow_exact_matches=False,
    ).collect()
    assert incl[0].v == 9.0      # equal instant matches by default
    assert strict[0].v == 5.0    # strict falls back to the earlier ref


def test_asof_nearest_single_exchange(spark):
    p, r, _, _ = _frames(spark)
    df = asof_join(
        p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"],
        direction="nearest",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # both window passes share one hashpartitioning exchange on k
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_numeric_axis_with_tolerance(spark):
    # as-of on a plain numeric ordering axis (schema versions), not time
    p = spark.createDataFrame(
        [(1, 1, 17), (2, 1, 4), (3, 1, 100)], ["pid", "k", "ver"]
    )
    r = spark.createDataFrame(
        [(1, 3, 30.0), (1, 15, 150.0), (1, 40, 400.0)], ["k", "ver", "v"]
    )
    got = {
        row.pid: (row.matched_ts, row.v)
        for row in asof_join(
            p, r, on=["k"], probe_ts="ver", ref_ts="ver", value_cols=["v"],
            tolerance_seconds=5,  # 5 "versions" on a numeric axis
        ).collect()
    }
    assert got[1] == (15, 150.0)       # gap 2 <= 5
    assert got[2] == (3, 30.0)         # gap 1 <= 5
    assert got[3] == (None, None)      # nearest prior is 40, gap 60 > 5


def test_band_join_numeric_axis(spark):
    p = spark.createDataFrame([(1, 0, 100), (2, 0, 250)], ["pid", "k", "x"])
    r = spark.createDataFrame(
        [(0, 90, 1.0), (0, 160, 2.0), (0, 240, 3.0)], ["k", "x", "v"]
    )
    got = time_band_join(p, r, "x", "x", band_seconds=60).collect()
    pairs = sorted((row.p_pid, row.r_v) for row in got)
    assert pairs == [(1, 1.0), (1, 2.0), (2, 3.0)]


def test_band_join_rejects_nonpositive_band(spark):
    p = spark.createDataFrame([(1, 0, 100)], ["pid", "k", "x"])
    try:
        time_band_join(p, p, "x", "x", band_seconds=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_stream_asof_multi_batch(spark, tmp_path):
    """Per-micro-batch as-of == whole-input as-of: a 3-file source with
    maxFilesPerTrigger=1 forces 3 micro-batches; the drained result must
    equal the batch join bit-for-bit."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from social_and_media_data_ingestion_spark.streaming.pipeline import (
        stream_asof_enrich,
    )

    rng = random.Random(11)
    probe = [(i, rng.randrange(5), rng.randrange(0, 5000)) for i in range(90)]
    ref = [(rng.randrange(5), rng.randrange(0, 5000), float(i)) for i in range(40)]
    src = tmp_path / "src"
    src.mkdir()
    for fi in range(3):
        chunk = [r for r in probe if r[0] % 3 == fi]
        tbl = pa.table(
            {
                "pid": pa.array([r[0] for r in chunk], pa.int64()),
                "k": pa.array([r[1] for r in chunk], pa.int64()),
                "x": pa.array([r[2] for r in chunk], pa.int64()),
            }
        )
        pq.write_table(tbl, str(src / f"f{fi}.parquet"))

    r_df = spark.createDataFrame(ref, "k bigint, x bigint, v double")
    stream = (
        spark.readStream.schema("pid bigint, k bigint, x bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stream_asof_enrich(
        stream,
        r_df,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "chk"),
        on=["k"],
        probe_ts="x",
        ref_ts="x",
        value_cols=["v"],
    )
    p_df = spark.createDataFrame(probe, "pid bigint, k bigint, x bigint")
    from social_and_media_data_ingestion_spark.operators.temporal_join import (
        asof_join,
    )

    want = asof_join(
        p_df, r_df, on=["k"], probe_ts="x", ref_ts="x", value_cols=["v"]
    )
    got_rows = sorted((r.pid, r.matched_ts, r.v) for r in out.collect())
    want_rows = sorted((r.pid, r.matched_ts, r.v) for r in want.collect())
    assert got_rows == want_rows
    # the source really was split into 3 micro-batches
    commits = os.listdir(tmp_path / "chk" / "commits")
    assert len([c for c in commits if not c.startswith(".")]) == 3


def test_asof_rejects_value_col_collision(spark):
    p = spark.createDataFrame([(1, 1, 10, 0.0)], ["pid", "k", "ts", "v"])
    r = spark.createDataFrame([(1, 5, 1.0)], ["k", "ts", "v"])
    try:
        asof_join(p, r, on=["k"], probe_ts="ts", ref_ts="ts", value_cols=["v"])
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "collide" in str(ex)


def test_stream_neardup_multi_batch(spark, tmp_path):
    """Per-micro-batch near-dup probing == whole-input probing: each new
    doc is judged against the STATIC index only, so batch boundaries
    cannot change the verdicts."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from social_and_media_data_ingestion_spark.operators.dedup import (
        _shingle_array,
        neardup_probe,
        word_shingles,
    )
    from social_and_media_data_ingestion_spark.streaming.pipeline import (
        stream_transform_to_parquet,
    )

    static_rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
    ]
    new_rows = [
        (10, "alpha beta gamma delta epsilon zeta"),       # exact dup of 1
        (11, "one two three four five six EIGHT"),         # near dup of 2
        (12, "totally different words entirely here now"), # clean
        (13, "alpha beta gamma delta epsilon zeta eta"),   # near dup of 1
        (14, "unrelated content again nothing shared ok"), # clean
        (15, "one two three four five six seven"),         # exact dup of 2
    ]
    static = spark.createDataFrame(static_rows, ["doc_id", "text"])
    idx = word_shingles(static, "doc_id", "text", n=3).select(
        F.col("id").alias("sid"), F.col("shingle").alias("s")
    )
    sizes = static.select(
        F.col("doc_id").alias("sid"),
        F.size(F.array_distinct(_shingle_array("text", 3))).cast("long").alias("s_sz"),
    )
    src = tmp_path / "src"
    src.mkdir()
    for fi in range(3):
        chunk = [r for r in new_rows if r[0] % 3 == fi]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                    "text": pa.array([r[1] for r in chunk], pa.string()),
                }
            ),
            str(src / f"f{fi}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stream_transform_to_parquet(
        stream,
        lambda b: neardup_probe(b, idx, sizes, "doc_id", "text", n=3, threshold=0.4),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    )
    batch_df = spark.createDataFrame(new_rows, ["doc_id", "text"])
    want = neardup_probe(batch_df, idx, sizes, "doc_id", "text", n=3, threshold=0.4)
    got_rows = sorted(tuple(r) for r in out.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows
    flags = {r[0]: (r[1], r[2]) for r in got_rows}
    assert flags[10] == (True, 1) and flags[15] == (True, 2)  # exact dups
    assert flags[13][0] is True and flags[13][1] == 1          # near dup
    assert flags[12] == (False, None) and flags[14] == (False, None)
    commits = os.listdir(tmp_path / "chk" / "commits")
    assert len([c for c in commits if not c.startswith(".")]) == 3


def test_triangle_count_known_graphs(spark):
    from social_and_media_data_ingestion_spark.operators.graph import (
        triangle_count,
    )

    # K4: 4 triangles, 12 wedges, clustering 1.0 — with noise the
    # canonicalizer must absorb (dupes, reversed edges, a self-loop)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1)]
    got = triangle_count(
        spark.createDataFrame(noisy, ["src", "dst"])
    ).first()
    assert (got.n_triangles, got.n_wedges, got.clustering) == (4, 12, 1.0)

    # path 0-1-2-3: no triangles, 2 wedges
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    got = triangle_count(path).first()
    assert (got.n_triangles, got.n_wedges, got.clustering) == (0, 2, 0.0)
