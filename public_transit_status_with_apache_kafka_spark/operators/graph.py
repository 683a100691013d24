"""PageRank (Brin/Page 1998) as Spark power iteration — the second
iterative-graph operator beside dedup's connected components, with the
different convergence shape: a weighted join+aggregate per round rather
than label propagation's min-fixpoint.

Scale shape per iteration: ONE equi-join of the edge list with the
current rank vector (shuffle on src; AQE skew-splits hub nodes) and ONE
groupBy(dst) sum (partial agg collapses hub fan-in map-side). Driver
traffic per round is two scalars (dangling mass via an aggregate, not a
collect of ranks). Ranks are lazily localCheckpoint-ed each round so
round N's plan doesn't replay rounds 1..N-1 (the connected-components
lineage-control trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Return (node, rank) after ``iters`` power-iteration rounds over
    the distinct edge list. Standard semantics: ranks start uniform,
    dangling (no-out-edge) mass redistributes uniformly, sum of ranks
    stays 1. Float sums depend on partition order in the last ulps, so
    this is a rows-only operator; a numpy reference implementation pins
    values to 1e-9 in tests."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=False)
        with_deg = ranks.join(deg, ranks.node == deg.src, "left")
        # dangling mass: ranks of nodes with no out-edges (one scalar)
        dangling = (
            with_deg.filter(F.col("deg").isNull()).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        shares = ranks.join(deg, ranks.node == deg.src).select(
            "node", (F.col("rank") / F.col("deg")).alias("share")
        )
        contribs = e.join(shares, e.src == shares.node).select(
            F.col("dst").alias("node"), F.col("share")
        )
        inflow = contribs.groupBy("node").agg(F.sum("share").alias("in_sum"))
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))
