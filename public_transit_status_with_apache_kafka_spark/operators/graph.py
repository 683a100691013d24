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
        # dangling mass (ranks of nodes with no out-edges) stays a
        # ONE-ROW FRAME broadcast into the round's plan — round 10: the
        # old per-round .collect() of this scalar was a blocking driver
        # job per iteration (2 jobs/round instead of 1; measured ~40%
        # of the query's wall). Association below preserves the original
        # driver-side order, damping * dang / n — lit(damping/n) * dang
        # could differ by ~1 ulp and flip a round(,8) half-boundary.
        dang = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        shares = ranks.join(deg, ranks.node == deg.src).select(
            "node", (F.col("rank") / F.col("deg")).alias("share")
        )
        contribs = e.join(shares, e.src == shares.node).select(
            F.col("dst").alias("node"), F.col("share")
        )
        inflow = contribs.groupBy("node").agg(F.sum("share").alias("in_sum"))
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.col("_dang") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))


# --------------------------------------------------------------- triangles
# Degree-oriented triangle counting (Suri & Vassilvitskii 2011, "Counting
# Triangles and the Curse of the Last Reducer"). Use case: the near-dup
# candidate-pair graph — healthy duplicate clusters are clique-like, so a
# LOW clustering coefficient flags bridge edges that would make the
# connected-components collapse over-merge. Orientation (edges point from
# lower to higher (degree, id)) bounds every node's out-degree at
# O(sqrt(m)), so a hub contributes zero wedges instead of deg^2 — no
# cartesian products, no windows, no driver-side adjacency.


def triangle_stats(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Global triangle census of an undirected graph given as an edge
    list (self-loops dropped, duplicates collapsed): one row with
    n_nodes, n_edges, n_wedges (paths of length 2 under the degree
    orientation — each counted once), n_triangles, and the global
    clustering coefficient in exact micro-units
    (3 * triangles * 1e6 / wedge-count over ALL orientations)."""
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge from lower (d, id) to higher (d, id)
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    # wedges around each pivot, each unordered {c1, c2} pair once
    o1 = oriented.select(F.col("src").alias("p"), F.col("dst").alias("c1"))
    o2 = oriented.select(F.col("src").alias("p"), F.col("dst").alias("c2"))
    wedges = o1.join(o2, "p").filter(F.col("c1") < F.col("c2"))
    closed = wedges.join(
        e, (F.col("u") == F.col("c1")) & (F.col("v") == F.col("c2")), "inner"
    )
    n_tri = closed.count()
    n_wedge_oriented = wedges.count()
    n_edges = e.count()
    n_nodes = deg.count()
    # open-wedge denominator over all orientations: sum_n d*(d-1)/2
    n_wedges_all = (
        deg.select(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")).first()["w"]
    )
    n_wedges_all = int(n_wedges_all or 0)
    spark = edges.sparkSession
    cc_micro = (
        (3 * n_tri * 1_000_000) // n_wedges_all if n_wedges_all else None
    )
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_wedge_oriented, n_tri, cc_micro)],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, "
        "clustering_micro long",
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 40,
) -> tuple[DataFrame, int]:
    """k-core of an undirected graph (Seidman 1983; distributed peeling
    as in Montresor et al. 2013): the maximal subgraph in which every
    node has degree >= k, found by iteratively deleting edges with an
    endpoint of degree < k until a fixpoint. Deleting such EDGES is
    equivalent to the classic node peeling — a node under the bar loses
    all its incident edges in that round — but keeps every step a
    partial-aggregable degree count plus two semi-joins, with no
    node-to-edge adjacency materialized.

    Scale: per round one groupBy on the directed edge list (8-byte
    keys, map-side combine) and two hash semi-joins against the
    surviving-node set; lineage is cut per round by localCheckpoint
    and the fixpoint signature rides an Observation on the SAME job
    that materializes the round (the _two_phase_cc pattern — no extra
    action per iteration). Rounds are data-bounded: each round strips
    a full onion layer, and real near-dup graphs (clique-like
    clusters) converge in 2-3 rounds; a path graph takes O(n) — the
    caller-visible `rounds` return makes runaway peeling observable.

    Returns (nodes, rounds): nodes = (id, core_degree) for every node
    in the k-core, with its degree restricted to the core.
    Raises RuntimeError if the peel has not converged in max_iter
    rounds (the result would be a mid-peel superset of the core)."""
    from pyspark.sql import Observation

    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    d = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint()
    )
    rounds = 0
    prev_sig = None
    while rounds < max_iter:
        keep = (
            d.groupBy("s").agg(F.count("*").alias("ds"))
            .filter(F.col("ds") >= k)
            .select("s")
        )
        obs = Observation(f"k_core_round_{rounds}_{id(d)}")
        nd = (
            d.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .select("s", "d")
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("s", "d").cast("decimal(38,0)")).alias("h"),
            )
            .localCheckpoint()
        )
        rounds += 1
        sig = (obs.get["n"], obs.get["h"])
        d = nd
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
    nodes = d.groupBy("s").agg(F.count("*").alias("core_degree")).select(
        F.col("s").alias("id"), "core_degree"
    )
    return nodes, rounds
