"""Unit + property tests for the distributed global ranking helpers
(operators.scale.global_row_number / global_ntile / global_running_sum):
they must agree EXACTLY with the unpartitioned-window spellings they
replace, across sizes that straddle partition boundaries, and be
deterministic across repeated invocations (the round-3 lesson:
repartitionByRange boundaries are not replay-stable, hence the
localCheckpoint inside the helpers)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators.scale import (
    global_ntile,
    global_row_number,
    global_running_sum,
)


def _df(spark, n, seed_mult=7919):
    rows = [(i, (i * seed_mult) % 104729, float((i * 31) % 97) - 48) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, key bigint, val double")


@pytest.mark.parametrize("n", [1, 5, 33, 1000])
def test_global_row_number_matches_window(spark, n):
    df = _df(spark, n)
    got = {
        r.id: r.rn
        for r in global_row_number(df, ["key", "id"], out_col="rn").collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (103, 4), (1000, 7)])
def test_global_ntile_matches_window(spark, n, k):
    df = _df(spark, n)
    got = {
        r.id: r.b for r in global_ntile(df, k, ["key", "id"], out_col="b").collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        r.id: r.b
        for r in df.withColumn("b", F.ntile(k).over(w).cast("long")).collect()
    }
    assert got == want


def test_global_running_sum_matches_window(spark):
    df = _df(spark, 500)
    got = {
        r.id: r.rs
        for r in global_running_sum(df, ["key", "id"], "val", out_col="rs").collect()
    }
    w = Window.orderBy("key", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: r.rs for r in df.withColumn("rs", F.sum("val").over(w)).collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_helpers_deterministic_across_invocations(spark):
    # the union input makes upstream partitioning AQE-sensitive — exactly
    # the shape that exposed the replay-instability of range boundaries
    base = _df(spark, 400)
    df = base.unionAll(base.select("id", (F.col("key") + 1).alias("key"), "val"))
    a = sorted((r.id, r.key, r.rn) for r in global_row_number(df, ["key", "id"], out_col="rn").collect())
    b = sorted((r.id, r.key, r.rn) for r in global_row_number(df, ["key", "id"], out_col="rn").collect())
    assert a == b


def test_global_running_sums_matches_two_single_calls(spark):
    from pyspark.sql import Window

    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sums,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(
        F.col("id"),
        ((F.col("id") * 7) % 13).alias("a"),
        ((F.col("id") * 11) % 17).alias("b"),
    )
    got = {
        r["id"]: (r["a_cum"], r["b_cum"])
        for r in global_running_sums(
            df, ["id"], ["a", "b"], num_partitions=8
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: (r["ac"], r["bc"])
        for r in df.withColumn("ac", F.sum("a").over(w))
        .withColumn("bc", F.sum("b").over(w))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r13 opt round: the prefix helpers became a map-only Arrow pass over the
# pre-sorted pinned frame (no Window, no second exchange). These tests pin
# the internals that rewrite introduced: exact integer/decimal carries
# across MANY Arrow batches, the window-compatible NULL semantics, and the
# sum result types the old window spelling produced.
# ---------------------------------------------------------------------------


def test_running_sum_exact_across_arrow_batches(spark):
    # tiny Arrow batches force the per-batch carry path many times per
    # partition; bigint values near 2^40 would expose any float detour
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_sums,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "19")
    try:
        df = spark.range(0, 700).select(
            F.col("id"),
            ((F.col("id") * 7919) % 104729).alias("key"),
            ((F.col("id") % 5) * F.lit(2**40) + F.col("id")).alias("v"),
            (F.col("id") * 1000 + 1).cast("decimal(30,0)").alias("d"),
        )
        w = Window.orderBy("key", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = {
            r.id: (r.v_cum, r.d_cum)
            for r in df.withColumn("v_cum", F.sum("v").over(w))
            .withColumn("d_cum", F.sum("d").over(w))
            .collect()
        }
        out = global_running_sums(df, ["key", "id"], ["v", "d"], num_partitions=8)
        got = {r.id: (r.v_cum, r.d_cum) for r in out.collect()}
        assert got == want  # exact, not approx: ints and decimals
        # schema parity with the window spelling: sum(bigint) -> bigint,
        # sum(decimal(30,0)) -> decimal(38,0)
        dt = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert dt["v_cum"] == "bigint"
        assert dt["d_cum"] == "decimal(38,0)"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_running_sum_null_semantics_match_window(spark):
    # F.sum's frame semantics: NULL values are skipped, and the output is
    # NULL until the first non-NULL of the (partition-local) order — on a
    # single partition that is exactly the unpartitioned window's answer
    rows = [(0, None), (1, None), (2, 5), (3, None), (4, 7), (5, None)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = [
        (r.id, r.rs)
        for r in df.withColumn("rs", F.sum("v").over(w)).orderBy("id").collect()
    ]
    got = [
        (r.id, r.rs)
        for r in global_running_sum(
            df, ["id"], "v", out_col="rs", num_partitions=1
        )
        .orderBy("id")
        .collect()
    ]
    assert got == want


def test_row_number_carries_across_arrow_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "23")
    try:
        df = _df(spark, 997)
        got = {
            r.id: r.rn
            for r in global_row_number(
                df, ["key", "id"], out_col="rn", num_partitions=8
            ).collect()
        }
        w = Window.orderBy("key", "id")
        want = {
            r.id: r.rn
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_running_sum_null_prefix_is_partition_local(spark):
    """r13 ADVICE: the NULL-until-first-non-NULL window is PARTITION-
    LOCAL — a row before its range partition's first non-NULL yields
    NULL even when earlier partitions contributed non-NULL totals
    (NULL + non-NULL offset was NULL in the pre-r13 window spelling
    too). This pins the map-only pass bit-compatible with the OLD
    spelling — and documents that both deliberately diverge from a
    single-window global running sum on this edge (which would emit the
    predecessor partitions' total instead of NULL)."""
    # ids 0..99 non-NULL, ids 100..199 NULL: with 4 range partitions on
    # id, partition >= 2 starts with a NULL prefix after non-NULL mass
    rows = [(i, 1 if i < 100 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {
        r.id: r.rs
        for r in global_running_sum(
            df, ["id"], "v", out_col="rs", num_partitions=4
        ).collect()
    }
    # every row at or past the first NULL is NULL in SOME partition-local
    # window; rows in the same partition as non-NULL mass keep summing
    assert got[0] == 1 and got[99] == 100
    # the tail partitions hold only NULLs -> NULL output (the
    # single-window oracle would say 100 here; divergence documented)
    assert got[199] is None
    # bit-compat with the pre-r13 Window.partitionBy(pid) spelling
    from pyspark.sql import Window as W

    pid = "__pid_chk"
    ranged = (
        df.repartitionByRange(4, F.col("id"))
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offs = {r[0]: r[1] for r in _prefix_offsets(ranged, pid)}
    w = (
        W.partitionBy(pid)
        .orderBy("id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off_map = F.create_map(
        *[F.lit(x) for p, o in sorted(offs.items()) for x in (p, o)]
    )
    want = {
        r.id: r.rs
        for r in ranged.withColumn(
            "rs",
            F.sum("v").over(w) + F.element_at(off_map, F.col(pid)),
        ).collect()
    }
    assert got == want


def _prefix_offsets(ranged, pid):
    rows = sorted(
        ranged.groupBy(pid).agg(F.sum("v").alias("s")).collect(),
        key=lambda r: r[pid],
    )
    acc = 0
    out = []
    for r in rows:
        out.append((r[pid], acc))
        acc += r["s"] or 0
    return out


def test_running_min_matches_window_with_nulls_multi_batch(spark):
    """r14: global_running_min's map-only Arrow pass must reproduce the
    window spelling exactly — NULL skipping, inclusive AND exclusive
    frames, carries across forced-small Arrow batches."""
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_min,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "19")
    try:
        rows = [
            (i, None if i % 7 in (0, 3) else (i * 37) % 101)
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "id bigint, v bigint")
        for excl, end in ((False, 0), (True, -1)):
            w = Window.orderBy("id").rowsBetween(
                Window.unboundedPreceding, end
            )
            want = {
                r.id: r.m
                for r in df.withColumn("m", F.min("v").over(w)).collect()
            }
            got = {
                r.id: r.m
                for r in global_running_min(
                    df,
                    ["id"],
                    "v",
                    out_col="m",
                    num_partitions=8,
                    exclusive=excl,
                ).collect()
            }
            assert got == want, f"exclusive={excl}"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_running_min_nan_doubles_match_window(spark):
    """NaN sorts above every non-NaN in Spark's min/least; the Arrow
    pass must reproduce that (plain Python `<` would freeze the running
    value once a NaN leads)."""
    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_min,
    )

    rows = [
        (
            i,
            None
            if i % 11 == 5
            else (
                float("nan")
                if i % 13 == 7
                else float((i * 37) % 101) - 50.0
            ),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id bigint, v double")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.m for r in df.withColumn("m", F.min("v").over(w)).collect()
    }
    got = {
        r.id: r.m
        for r in global_running_min(
            df, ["id"], "v", out_col="m", num_partitions=8
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        g, x = got[k], want[k]
        assert g == x or (g != g and x != x), (k, g, x)


def test_running_min_decimal_and_string_types(spark):
    """The Arrow pass keeps value_col's own type and ordering for
    non-numeric orderable types (Decimal exactness; str UTF-8 order)."""
    from decimal import Decimal

    from social_and_media_data_ingestion_spark.operators.scale import (
        global_running_min,
    )

    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    dfc = spark.createDataFrame(
        [(i, Decimal((i * 37) % 101) / Decimal(4)) for i in range(300)],
        "id bigint, v decimal(12,2)",
    )
    got = global_running_min(dfc, ["id"], "v", out_col="m", num_partitions=8)
    assert dict(got.dtypes)["m"] == "decimal(12,2)"
    assert {r.id: r.m for r in got.collect()} == {
        r.id: r.m for r in dfc.withColumn("m", F.min("v").over(w)).collect()
    }
    dfs = spark.createDataFrame(
        [(i, f"s{(i * 53) % 97:03d}") for i in range(300)],
        "id bigint, v string",
    )
    assert {
        r.id: r.m
        for r in global_running_min(
            dfs, ["id"], "v", out_col="m", num_partitions=8
        ).collect()
    } == {r.id: r.m for r in dfs.withColumn("m", F.min("v").over(w)).collect()}
