"""Iterative graph algorithms beyond connected components
(operators/dedup.py::connected_components): exact integer PageRank.

Training-data pipelines use link-graph centrality as a document-quality
prior (the classic web-corpus weighting); entity graphs (customer <->
supplier here) get the same treatment. Like the k-means trainer
(operators/clustering.py), the iteration is made ORACLE-CHECKABLE by
keeping all mass in integer micro-units: ranks are BIGINTs, per-edge
contributions use integer division, and the damping step is
``150000 + (85 * incoming) div 100`` — no float appears anywhere, so any
engine replaying the recipe (and any partitioning / summation order)
produces bit-identical ranks. The float formulation r' = 0.15 + 0.85 *
sum(contrib) is order-dependent in the sum and engine-dependent in the
multiply — unreproducible at scale.

Scale shape per iteration (E edges, V nodes): one shuffle joining ranks
to edges on src, one shuffle aggregating contributions on dst — the
canonical Pregel exchange pair. At 100 TB: pre-partition the edge table
by src once (it is iteration-invariant — the join then reuses the
layout), keep ranks as the small side where degree skew allows broadcast,
and checkpoint every few rounds exactly as connected_components does to
cut lineage. Dangling nodes are absent by construction when the caller
symmetrizes the edge list (every node then has out-degree >= 1); with a
directed list, add the standard dangling-mass redistribution first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TELEPORT_U6 = 150_000  # (1 - d) with d = 0.85, in micro-units
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_exact(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-budget PageRank over a (src, dst) edge list; returns
    (node, rank_u6) with rank in exact micro-units (average 1e6 per node
    up to integer-division rounding). One lazy plan — ``iters`` is small
    by construction (like kmeans_train); loop externally with checkpoints
    for long runs."""
    deg = edges.groupBy(src).agg(F.count("*").alias("_out_deg"))
    nodes = edges.select(F.col(src).alias("node")).distinct()
    ranks = nodes.withColumn("rank_u6", F.lit(1_000_000).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(deg, src)
            .select(
                F.col(dst).alias("_to"),
                F.expr("rank_u6 div _out_deg").alias("_c"),
            )
        )
        incoming = contrib.groupBy("_to").agg(F.sum("_c").alias("_in"))
        ranks = (
            nodes.join(incoming, nodes["node"] == incoming["_to"], "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT_U6)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(_in, 0)) div {DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("rank_u6"),
            )
        )
    return ranks
