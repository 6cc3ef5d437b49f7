"""Tests for operators/scale.py: salting preserves semantics; bucketed
joins run shuffle-free (asserted on the physical plan)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators import scale as SC
from social_and_media_data_ingestion_spark.plans.tables import t

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain(spark):
    ev = t(spark, SF, "events")
    # make users a "too big to broadcast" stand-in dim
    users = ev.select("user_id").distinct().withColumn(
        "tier", (F.col("user_id") % 3).cast("int")
    )
    plain = ev.join(users, ["user_id"]).select("event_id", "tier")
    salted = SC.salted_join(ev, users, ["user_id"], n=8).select("event_id", "tier")
    assert _rows(plain, ["event_id", "tier"]) == _rows(salted, ["event_id", "tier"])


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = SC.salted_join(left, right, ["k"], how="left", n=4)
    got = {r["k"]: r["w"] for r in out.collect()}
    assert got == {1: "x", 2: None, 3: None}


def test_salted_join_rejects_right_and_full(spark):
    """Right/full outer would emit each unmatched right row n times (the
    small side is replicated per salt) — must raise, not silently dup."""
    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            SC.salted_join(left, right, ["k"], how=how, n=4)


def test_salted_aggregate_matches_plain(spark):
    ev = t(spark, SF, "events")
    plain = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sort_array(F.collect_set("event_type")).alias("types"),
    )
    salted = SC.salted_aggregate(
        ev,
        ["user_id"],
        [F.count("*").alias("c"), F.collect_set("event_type").alias("s")],
        [
            F.sum("c").cast("long").alias("n"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("s")))).alias(
                "types"
            ),
        ],
    )
    key = lambda df: sorted(
        (r["user_id"], r["n"], tuple(r["types"])) for r in df.collect()
    )
    assert key(plain) == key(salted)


def test_bucketed_join_is_shuffle_free(spark):
    tmp = tempfile.mkdtemp(prefix="buckets_")
    try:
        orders = t(spark, SF, "orders")
        li = t(spark, SF, "lineitem")
        SC.write_bucketed(
            orders, "b_orders", f"{tmp}/b_orders", ["o_orderkey"], num_buckets=8
        )
        SC.write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            f"{tmp}/b_lineitem",
            ["o_orderkey"],
            num_buckets=8,
        )
        bo = SC.read_bucketed(spark, "b_orders")
        bl = SC.read_bucketed(spark, "b_lineitem")
        # force SMJ so the exchange (or its absence) is observable
        joined = bo.hint("merge").join(bl, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is still right
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_agg_is_shuffle_free(spark):
    tmp = tempfile.mkdtemp(prefix="buckets_")
    try:
        ev = t(spark, SF, "events")
        SC.write_bucketed(ev, "b_events", f"{tmp}/b_events", ["user_id"], num_buckets=8)
        be = SC.read_bucketed(spark, "b_events")
        agg = be.groupBy("user_id").agg(F.count("*").alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")
        shutil.rmtree(tmp, ignore_errors=True)


def test_partition_pruning(spark, tmp_path):
    """Writes partitioned by a column must prune at read time: the filter
    lands in PartitionFilters, not in post-scan Filter."""
    out = str(tmp_path / "ev_parted")
    ev = t(spark, SF, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    n_types = ev.select("event_type").distinct().count()
    assert n_types > 1
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_salt_spreads_hot_key_across_partitions(spark):
    """Correctness of salted ops is proven above; this pins the POINT of
    salting — a key that is 90% of the input must occupy >1 shuffle
    partition after salting (it occupies exactly 1 without)."""
    from pyspark.sql import functions as F

    from social_and_media_data_ingestion_spark.operators.scale import with_salt

    rows = [("hot", i) for i in range(9000)] + [(f"k{i}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    n = 8
    plain_parts = (
        df.repartition(16, "k")
        .where(F.col("k") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    salted_parts = (
        with_salt(df, n)
        .repartition(16, "k", "__salt")
        .where(F.col("k") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert plain_parts == 1
    assert salted_parts > 1
