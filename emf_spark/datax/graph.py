"""Graph analytics on the integer lattice.

``pagerank_exact``: dampened PageRank with ALL arithmetic in int64 —
ranks scale by 1e9, per-edge contributions and the damping step use
truncate-toward-zero integer division (Spark ``div`` == DuckDB ``//``
on bigint), so the full iterative computation is deterministic (no
float sum-order effects) and an external SQL engine replays every
iteration bit-for-bit. The same exactness treatment as
similarity.kmeans_exact; connected components live in
datax/dedup.dedup_clusters.

Scale shape per iteration: one shuffle join of the rank vector onto
edges keyed by src (the rank vector is node-cardinality; at 100 TB of
edges pre-partition both by the node key and the Exchange disappears),
one map-side-combinable inflow aggregate keyed by dst, one left join
back onto the node list (zero in-degree nodes keep the damping floor).
Lineage is cut per iteration with localCheckpoint, the dedup_clusters
lesson (4^k plan growth otherwise). Nothing ever collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 10**9


def pagerank_exact(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` dampened PageRank rounds, rank an
    int64 in units of 1e-9 (sum over nodes ~ N * 1e9, the unnormalized
    convention). Damping is expressed in integer percent so the update
    rule is pure int64: rank' = (100-d)% * SCALE // 100 +
    d% * inflow // 100, inflow = sum over in-edges of
    rank_src // out_degree(src).

    Dangling nodes are NOT redistributed — callers wanting the classic
    redistribution should add self-loops (or reverse edges) upstream;
    keeping the operator free of a whole-graph scalar broadcast is
    deliberate (a 1-row nested-loop join per iteration is the kind of
    plan wart the rest of this repo pins against)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_s").localCheckpoint(eager=True)
    floor = (100 - damping_pct) * PR_SCALE // 100
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(iters):
        inflow = (
            ed.join(ranks.withColumnRenamed("node", "_s"), "_s")
            .select("_d", F.expr("rank div _deg").alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(inflow.withColumnRenamed("_d", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(floor).cast("bigint")
                    + F.expr(
                        f"({damping_pct} * coalesce(_in, 0L)) div 100"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
