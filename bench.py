"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line on stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: best_sec}, "sf": ...}.

The stdout line is kept COMPACT on purpose: the driver captures only a
bounded tail of stdout, and round 4's artifact (per-run arrays + spread
for 50 queries on one line) outgrew that buffer and recorded as
`parsed: null`. The full self-diagnosing payload — all 3 per-run times
and the relative spread per query, which lets a round-over-round drift
be attributed to machine-load variance (wide spread) vs a real plan
regression (tight spread at a higher level) — is written to
`BENCH_FULL.json` next to this script and echoed to stderr instead.

Each query is materialized via a count-collect (no driver-side data pull)
after a warm-up pass to amortize JVM/session startup out of the first
measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from social_and_media_data_ingestion_spark import get_spark
from social_and_media_data_ingestion_spark.plans.queries import registry

HEADLINE = [
    "flagship_submission_extract",
    "agg_pricing_summary",
    "j2_fk_join_agg",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_orders",
    "window_topk_orders",
    "dedup_fingerprint",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk",
    "events_windowed_agg",
    "events_sessionize",
    # complex relational shapes (round 1 widening)
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "events_weekly_retention",
    # training-data pipeline ops
    "pii_redact_documents",
    "text_chunk_documents",
    "doc_pack_contexts",
    "corpus_curate_pipeline",
    "text_tfidf_topterms",
    "emb_kmeans_assign",
    "corpus_decontaminate",
    "emb_quantize_int8",
    "events_time_bucket_rollup",
    # distributed-rank scale helpers (round 4): global_ntile /
    # global_running_sum pay 2 jobs + localCheckpoint — benched so a
    # regression in that machinery shows up in the artifact
    "window_ntile_quartiles",
    "orders_rfm_segmentation",
    "docs_quality_deciles",
    "events_max_concurrent",
    # Aho-Corasick large-keyword path (round 4): 5000 patterns per doc
    "f2_keyword_substring_5k",
    # temporal joins (round 4): as-of via union+window (one shuffle),
    # band join via bucket equi-join — benched so a theta-join fallback
    # would show up as a cliff, not just a failed plan guard
    "j9_asof_view_purchase",
    "events_coactivity_histogram",
    # round-4 second batch: lake ops, wedge analytics, decayed features
    "scd2_user_state_history",
    "lake_merge_upsert",
    "graph_triangle_suppliers",
    "events_decayed_activity",
    # round-4 continuation: retrieval scoring (map-only BM25), the DQ
    # gatekeeper (union of independent scans), Bloom runtime-filter
    # audit (broadcast-only probes), ABC on the distributed prefix sum
    "text_bm25_scores",
    "dq_constraint_report",
    "join_bloom_filter_audit",
    "lineitem_abc_pareto",
    # round-4 third batch: count-based model training (broadcast-model
    # scoring join), inverted-index containment, the distributed
    # prefix-min skyline, and sequence mining — benched so the new
    # operator classes have a throughput artifact, not just plan guards
    "ml_naive_bayes_source",
    "dedup_shingle_containment",
    "part_price_skyline",
    "events_trigram_paths",
    # round-4 closing batch: distributed-rank statistics (Gini,
    # Mann-Whitney), the integer-exact forecast backtest, and the
    # min-combine novelty score — benched so the prefix-sum/rank
    # machinery these share is regression-visible in the artifact
    "supplier_revenue_gini",
    "stats_mann_whitney_status",
    "orders_forecast_backtest",
    "text_shingle_novelty",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    reg = registry()

    # Warm-up pass: JVM codegen, parquet footers, broadcast paths. The
    # measured pass is steady-state throughput (what a long-running cluster
    # job sees), not first-query JIT cost.
    for name in HEADLINE:
        reg[name].spark(spark, sf_dir).count()

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        # 3 measured runs, ALL recorded; headline value is the best
        # (steady-state throughput, robust to one-off scheduler/GC
        # hiccups on a shared machine) but the full spread stays in the
        # artifact for drift attribution
        rs: list[float] = []
        n = 0
        for _ in range(3):
            t0 = time.time()
            n = reg[name].spark(spark, sf_dir).count()
            rs.append(round(time.time() - t0, 3))
        runs[name] = rs
        times[name] = min(rs)
        print(f"# {name}: {n} rows in {times[name]}s (runs: {rs})", file=sys.stderr)

    total = round(sum(times.values()), 3)
    spread = {
        name: round((max(rs) - min(rs)) / min(rs), 3) if min(rs) > 0 else 0.0
        for name, rs in runs.items()
    }
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full self-diagnosing payload → file + stderr (NOT stdout: the
    # driver's stdout tail buffer is bounded; see module docstring).
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "runs": runs,
        "rel_spread": spread,
        "sf": sf_val,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(full), file=sys.stderr)
    # Compact final stdout line: best-only per query, 3 dp.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in times.items()},
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
