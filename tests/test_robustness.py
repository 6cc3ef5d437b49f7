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
