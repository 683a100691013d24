"""Scale probe for the iterative graph family (round-7 item #5):
x_pagerank_exact / x_bfs_hops / x_sssp_bellman / x_temporal_reach are
the only heavy query family with no recorded replication probe. This
tool replicates the sf0.1 customer<->supplier transaction graph into
N DISJOINT copies (node ids offset by copy * 1e9; the seed set
customers 1..10 exists in every copy via the modular predicate) and
runs each Pregel-shaped iterate loop at 1x/4x/16x, recording:

- per-round FRONTIER rows (the state each next round joins against) —
  the quantity that must scale with the graph, never superlinearly;
- per-round wall seconds and total rows/sec.

The loops here are structural mirrors of the registered plans (same
join-per-round + partial-agg + localCheckpoint cadence), parameterized
only by the seed predicate so replicated copies all participate;
the registered queries themselves stay untouched. Linear-or-better
rows/sec across 1x -> 4x -> 16x is the evidence the round shape is one
hash join + one partial agg with no hidden quadratic or driver-side
traversal; per-round frontier counts growing ~factor-proportionally
confirm state scales with the data, not with iteration count.

The lineage-boundedness companion (checkpoint cadence keeps the plan
flat across rounds) is asserted in tests/test_graph_probe.py.

Usage: python tools/probe_graph.py [sf_dir] [max_factor]
Prints one JSON line per (op, factor); the committed record lives at
tools/probe_results/probe_graph.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

OFF = 1_000_000_000  # per-copy node offset (suppliers sit at +1e6)
SUPP = 1_000_000


def base_half(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + SUPP).alias("dst"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("cnt"),
            F.min(
                F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
            ).alias("day"),
        )
    )


def replicate(spark, half, factor: int):
    """factor disjoint graph copies, node ids offset per copy."""
    copies = spark.range(factor).select((F.col("id") * OFF).alias("off"))
    return (
        half.crossJoin(copies)
        .select(
            (F.col("src") + F.col("off")).alias("src"),
            (F.col("dst") + F.col("off")).alias("dst"),
            "cnt",
            "day",
        )
        .localCheckpoint()
    )


def symmetrize(half):
    return half.select("src", "dst", "cnt", "day").unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "cnt", "day"
        )
    )


def seeds_of(edges):
    return (
        edges.select(F.col("src").alias("node"))
        .filter(F.pmod("node", F.lit(OFF)) <= 10)
        .distinct()
    )


def run_bfs(edges, rounds=4):
    per_round = []
    visited = seeds_of(edges).localCheckpoint(eager=False)
    frontier = visited
    for _ in range(rounds):
        t0 = time.time()
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "anti")
            .localCheckpoint(eager=False)
        )
        n = nxt.count()
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
        per_round.append({"frontier": n, "sec": round(time.time() - t0, 2)})
    return per_round


def run_sssp(edges, rounds=4):
    per_round = []
    w_edges = edges.withColumn("w", F.expr("1000000 div cnt")).localCheckpoint(
        eager=False
    )
    dist = seeds_of(edges).withColumn("d", F.lit(0).cast("long"))
    for _ in range(rounds):
        t0 = time.time()
        relaxed = w_edges.join(dist, w_edges.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("d") + F.col("w")).alias("d")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
        n = dist.count()
        per_round.append({"frontier": n, "sec": round(time.time() - t0, 2)})
    return per_round


def run_pagerank(edges, rounds=3):
    per_round = []
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    rank = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("rank_micro")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        t0 = time.time()
        contrib = ed.join(rank, ed.src == rank.node).select(
            "dst", F.expr("rank_micro div outdeg").alias("c")
        )
        rank = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(
                (F.lit(150_000) + F.expr("(85 * sum(c)) div 100"))
                .cast("long")
                .alias("rank_micro")
            )
            .localCheckpoint(eager=False)
        )
        n = rank.count()
        per_round.append({"frontier": n, "sec": round(time.time() - t0, 2)})
    return per_round


def run_temporal(edges, rounds=4):
    per_round = []
    arr = seeds_of(edges).withColumn("arrival", F.lit(0).cast("long"))
    for _ in range(rounds):
        t0 = time.time()
        relaxed = edges.join(
            arr, (edges.src == arr.node) & (edges.day >= arr.arrival)
        ).select(F.col("dst").alias("node"), F.col("day").alias("arrival"))
        arr = (
            arr.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=False)
        )
        n = arr.count()
        per_round.append({"frontier": n, "sec": round(time.time() - t0, 2)})
    return per_round


OPS = {
    "x_bfs_hops": run_bfs,
    "x_sssp_bellman": run_sssp,
    "x_pagerank_exact": run_pagerank,
    "x_temporal_reach": run_temporal,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("probe_graph")
    spark.sparkContext.setLogLevel("ERROR")
    half = base_half(spark, sf_dir)

    records = []
    factor = 1
    while factor <= max_factor:
        edges = symmetrize(replicate(spark, half, factor)).localCheckpoint()
        n_edges = edges.count()
        for op, fn in OPS.items():
            t0 = time.time()
            rounds = fn(edges)
            total = round(time.time() - t0, 2)
            rec = {
                "op": op,
                "factor": factor,
                "n_edges": n_edges,
                "rounds": rounds,
                "total_sec": total,
                "edge_rows_per_sec_per_round": round(
                    n_edges * len(rounds) / max(total, 1e-9)
                ),
            }
            records.append(rec)
            print(json.dumps(rec))
        factor *= 4

    import os

    out = os.path.join(os.path.dirname(__file__), "probe_results", "probe_graph.json")
    with open(out, "w") as fh:
        json.dump(records, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
