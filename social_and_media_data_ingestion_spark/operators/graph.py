"""Iterative graph analytics on edge DataFrames.

Connected components lives in operators/dedup.py (it grew out of the
near-dup clustering path); this module holds the general-purpose
algorithms. Everything is expressed as joins + partial-combinable
aggregates per iteration — the plan shape that scales: one shuffle per
iteration keyed on the node id, lineage kept flat by construction
(fixed iteration count unrolled into one Catalyst plan, or checkpointed
by the caller between rounds for long runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree) from a directed edge list."""
    return edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_degree")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 10,
) -> DataFrame:
    """(node, pr) after `iters` synchronous PageRank rounds from a
    uniform start: pr = (1-d)/N + d * sum_in(pr_src / outdeg_src).

    `edges` is a directed (src, dst) list; callers wanting undirected
    semantics pass both directions. Dangling mass (nodes with no
    out-edges) is dropped, the classic simplification — supply
    bidirectional edges to avoid it.

    Per-iteration ranks are rounded to `round_dp` decimals so the
    result is reproducible across engines (float summation order
    differs; 1e-10 rounding absorbs it — the lloyd_centroids trick).
    Each iteration costs ONE shuffle: the contribution aggregate keyed
    on dst; the degree/rank joins re-use that partitioning. N and the
    iteration count are plan literals — no driver-side data collect.
    """
    e = edges.select(F.col("src").alias("s"), F.col("dst").alias("t"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("t").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("s").alias("d_node")).agg(F.count("*").alias("deg"))
    n_nodes = nodes.count()  # scalar: one number to the driver, like a codebook
    pr = nodes.select(F.col("node").alias("p_node"), F.lit(1.0 / n_nodes).alias("pr"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            e.join(pr, e.s == F.col("p_node"))
            .join(deg, F.col("d_node") == e.s)
            .select(F.col("t").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c_sum"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            F.col("node").alias("p_node"),
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("c_sum", F.lit(0.0)),
                round_dp,
            ).alias("pr"),
        )
    return pr.select(F.col("p_node").alias("node"), "pr")
