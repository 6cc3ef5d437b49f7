"""Tests: small-file compaction and the plain-SQL entry point."""

from __future__ import annotations

import glob

from social_and_media_data_ingestion_spark.io import compact_parquet
from social_and_media_data_ingestion_spark.plans.tables import sql, t

SF = "/root/testdata/sf0.001"


def test_compact_parquet_reduces_files(spark, tmp_path):
    src, dst = str(tmp_path / "many"), str(tmp_path / "compacted")
    ev = t(spark, SF, "events")
    ev.repartition(16).write.parquet(src)  # deliberately fragmented
    assert len(glob.glob(f"{src}/*.parquet")) == 16
    n = compact_parquet(spark, src, dst, target_file_mb=512)
    assert n == 1  # tiny data -> one full-size file
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == ev.count()


def test_compact_parquet_sorted_within(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev = t(spark, SF, "events")
    ev.repartition(4).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=512, sort_within_by=["ts"])
    got = [r.ts for r in spark.read.parquet(dst).collect()]
    assert got == sorted(got)  # one file, sorted -> fully ordered


def test_compact_parquet_preserves_partitioning(spark, tmp_path):
    """Hive-partitioned source: recursive sizing must count nested files,
    and partition_by must keep the key=value physical layout on rewrite."""
    src, dst = str(tmp_path / "part_src"), str(tmp_path / "part_dst")
    ev = t(spark, SF, "events")
    ev.repartition(4).write.partitionBy("event_type").parquet(src)
    nested = glob.glob(f"{src}/event_type=*/*.parquet")
    assert nested  # layout really is hive-partitioned
    compact_parquet(spark, src, dst, target_file_mb=512,
                    partition_by=["event_type"])
    out_dirs = glob.glob(f"{dst}/event_type=*")
    assert out_dirs  # layout preserved, not flattened
    assert spark.read.parquet(dst).count() == ev.count()


def test_sql_entry_point(spark):
    out = sql(
        spark,
        SF,
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    )
    rows = {r.l_returnflag: r.n for r in out.collect()}
    li = t(spark, SF, "lineitem")
    assert rows == {
        r.l_returnflag: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }


def test_orc_roundtrip_pushdown(spark, tmp_path):
    from social_and_media_data_ingestion_spark.io import read_orc, write_orc

    src = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS k", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    path = str(tmp_path / "orc_t")
    write_orc(src, path, partition_by=["k"])
    back = read_orc(spark, path)
    assert back.count() == 1000
    got = back.filter("k = 3 AND id < 100").select("id").orderBy("id")
    assert [r["id"] for r in got.collect()] == [
        i for i in range(100) if i % 7 == 3
    ]
    # partition pruning: the k=3 filter must prune to one partition dir
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
