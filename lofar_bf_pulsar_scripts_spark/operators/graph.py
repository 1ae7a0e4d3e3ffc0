"""Exact-integer PageRank (link-graph quality signal for web-scale
data curation — the CommonCrawl-style centrality score used to
prioritize crawl frontiers and weight training documents).

Companion to the iterative connected-components pass in
``pipeline.dup_clusters``: CC is the min-label fixed point, PageRank
the weighted-mass fixed point.  Both share the 100 TB shape — one
rank⋈edges equi-join plus one dst-keyed aggregation per iteration,
nothing ever collected to the driver.

All arithmetic is integer: ranks are fixed-point values scaled by
``scale`` and every division is an integer floor, so a fixed
iteration count produces bit-identical results on any engine and any
partitioning (integer sums are associative; float PageRank would
drift with aggregation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMP_NUM, DAMP_DEN = 85, 100  # damping factor 0.85 as an exact ratio


def pagerank_iterations(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int,
    scale: int = 10**12,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    n_nodes: int | None = None,
) -> DataFrame:
    """Run ``n_iter`` synchronous PageRank iterations and return
    (node, rank) with integer fixed-point ranks.

    r_0(v)      = scale div N
    r_{t+1}(v)  = (15 * scale) div (100 * N)
                  + sum over in-edges (u, v):
                        (85 * r_t(u)) div (100 * outdeg(u))

    Out-degrees count edge multiplicity; nodes without in-edges keep
    the teleport mass (left join).  Dangling nodes (no out-edges)
    simply leak their damped mass — the convention that needs no
    global dangling-sum reduction, keeping each iteration a single
    join + aggregation.

    Scale shape: ranks are |V| rows, edges |E| rows; every iteration
    is one equi-join on the src key and one dst-keyed aggregation —
    both shuffle-partitioned, nothing driver-side.  The loop builds
    ``n_iter`` plan layers; for large n_iter, checkpoint per
    iteration (``dup_clusters`` precedent) — callers here use small
    fixed counts.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if scale < 10**6:
        raise ValueError("scale too small for meaningful fixed-point ranks")
    # bounded: one scalar; callers that already know |V| (e.g. they
    # derived the edge modulus from it) pass n_nodes to avoid a
    # second count job over the node table
    n = int(n_nodes) if n_nodes is not None else nodes.count()
    if n == 0:
        raise ValueError("empty node set")
    teleport = (15 * scale) // (100 * n)
    deg = edges.groupBy(F.col(src_col).alias("__u")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    # degree table is |V|-sized: plain equi-join, AQE may broadcast
    e = edges.select(
        F.col(src_col).alias("__u"), F.col(dst_col).alias("__v")
    ).join(deg, "__u")
    base = nodes.select(F.col(node_col).alias("__v"))
    ranks = base.withColumn("rank", F.lit(int(scale // n)).cast("long"))
    for _ in range(n_iter):
        contribs = (
            e.join(
                ranks.select(F.col("__v").alias("__u"), "rank"), "__u"
            )
            .select(
                "__v",
                F.expr(f"(rank * {DAMP_NUM}) div ({DAMP_DEN} * __deg)").alias(
                    "__c"
                ),
            )
            .groupBy("__v")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = base.join(contribs, "__v", "left").select(
            "__v",
            (
                F.lit(int(teleport)) + F.coalesce(F.col("__in"), F.lit(0))
            ).cast("long").alias("rank"),
        )
    return ranks.select(F.col("__v").alias(node_col), "rank")
