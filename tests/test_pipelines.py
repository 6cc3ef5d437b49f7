"""End-to-end pretraining-corpus pipeline: stage attrition is monotonic,
each stage drops exactly the rows its operator is supposed to drop, and
survivors are untouched (no column mutation leaks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.pipelines import (
    decontaminate,
    exact_dedup,
    near_dedup,
    pretraining_corpus_pipeline,
    quality_gate,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    from social_and_media_data_ingestion_spark.plans.tables import t

    return t(spark, SF, "documents")


def test_stage_attrition_monotonic(spark):
    docs = _docs(spark)
    eval_docs = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    # the synthetic corpus shares a ~60-word vocabulary, so bigram overlap
    # with ANY eval split is high (median ~0.79); 0.85 keeps the stage
    # meaningful (some docs drop, some survive) on this data
    stages = pretraining_corpus_pipeline(train, eval_docs, max_overlap=0.85)
    n0 = train.count()
    counts = {name: df.count() for name, df in stages.items()}
    assert (
        n0
        >= counts["quality_gate"]
        >= counts["exact_dedup"]
        >= counts["near_dedup"]
        >= counts["decontaminated"]
    )
    # every stage must keep the original schema
    for df in stages.values():
        assert df.columns == train.columns
    # the pipeline must actually do something on this data
    assert counts["decontaminated"] < n0
    assert counts["decontaminated"] > 0


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different text")],
        ["doc_id", "text"],
    )
    got = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert got == [1, 3]


def test_near_dedup_keeps_canonical(spark):
    # 1 and 2 are near-dups (same tokens, one extra); 2 is longer -> kept
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", 30),
            (2, "alpha beta gamma delta epsilon zeta", 36),
            (3, "totally unrelated content words", 31),
        ],
        ["doc_id", "text", "n_chars"],
    )
    got = sorted(r.doc_id for r in near_dedup(df, threshold=0.7).collect())
    assert got == [2, 3]


def test_decontaminate_drops_overlapping(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "completely clean document text")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(99, "the quick brown fox jumps")], ["doc_id", "text"])
    got = sorted(r.doc_id for r in decontaminate(train, ev).collect())
    assert got == [2]


def test_quality_gate_filters(spark):
    df = spark.createDataFrame(
        [
            (1, "the of and to a in is it you that " * 5),  # en, long enough
            (2, "too short"),
        ],
        ["doc_id", "text"],
    )
    got = [r.doc_id for r in quality_gate(df).collect()]
    assert got == [1]
