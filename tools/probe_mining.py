"""Scale probe for the round-7 mining family.

Three claims, measured at 1x/4x/16x corpus replication:

- e2_sorted_neighborhood: the band join performs <= n*w COMPARISONS
  (SNM's defining bound) — counted pre-threshold, asserted per factor.
- x_sssp_bellman / x_bfs_hops: per-round relaxed-candidate rows grow
  linearly with the edge count (one hash join per round, no quadratic
  frontier blow-up), and wall time tracks rows.

Usage: python tools/probe_mining.py [sf_dir] [max_factor]
Prints one JSON line per probe; append to tools/probe_results/.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators.rank import (  # noqa: E402
    stratified_rank,
)
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

SNM_W = 3
SNM_PREFIX = 24


def replicate(df, factor: int, id_col: str):
    out = df
    copies = 1
    while copies < factor:
        out = out.unionByName(
            out.withColumn(id_col, F.col(id_col) + F.lit(100_000_000 * copies))
        )
        copies *= 2
    return out.localCheckpoint()


def snm_probe(spark, sf_dir, factor):
    docs = replicate(
        load(spark, sf_dir, "documents").select("doc_id", "text"), factor, "doc_id"
    )
    n = docs.count()
    keyed = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), 1, SNM_PREFIX
        ).alias("skey"),
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    t0 = time.time()
    ranked = stratified_rank(keyed, [], ["skey", "doc_id"], rank_col="rnk").drop(
        "n_stratum"
    )
    a = ranked.select(
        F.col("rnk").alias("rnk_a"),
        F.explode(
            F.array(F.expr(f"rnk div {SNM_W}"), F.expr(f"rnk div {SNM_W} + 1"))
        ).alias("bucket"),
    )
    b = ranked.select(F.col("rnk").alias("rnk_b"), F.expr(f"rnk div {SNM_W}").alias("bucket"))
    comparisons = (
        a.join(b, "bucket")
        .filter(
            (F.col("rnk_b") - F.col("rnk_a") >= 1)
            & (F.col("rnk_b") - F.col("rnk_a") <= SNM_W)
        )
        .count()
    )
    sec = round(time.time() - t0, 2)
    bound = n * SNM_W
    assert comparisons <= bound, (comparisons, bound)
    return {
        "probe": "snm",
        "factor": factor,
        "docs": n,
        "comparisons": comparisons,
        "bound_n_times_w": bound,
        "bound_holds": comparisons <= bound,
        "sec": sec,
    }


def _replicate_graph(df, factor, key_cols):
    """Disjoint-subgraph replication: offset EVERY id column per copy so
    edges (not just rows) multiply by the factor."""
    out = df
    copies = 1
    while copies < factor:
        shifted = out
        for c in key_cols:
            shifted = shifted.withColumn(c, F.col(c) + F.lit(100_000_000 * copies))
        out = out.unionByName(shifted)
        copies *= 2
    return out.localCheckpoint()


def sssp_probe(spark, sf_dir, factor):
    o = _replicate_graph(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        factor,
        ["o_orderkey", "o_custkey"],
    )
    li = _replicate_graph(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"),
        factor,
        ["l_orderkey", "l_suppkey"],
    )
    t0 = time.time()
    half = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
        .withColumn("w", F.expr("1000000 div cnt"))
        .select("src", "dst", "w")
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint()
    n_edges = edges.count()
    dist = (
        edges.select(F.col("src").alias("node"))
        # every replicated subgraph gets its own seed set, so reached
        # frontier AND edge work both scale with the factor
        .filter(F.col("node") % 100_000_000 <= 10)
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
    )
    relaxed_rows = []
    for _ in range(4):
        relaxed = edges.join(dist, edges.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("d") + F.col("w")).alias("d")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        relaxed_rows.append(dist.count())
    sec = round(time.time() - t0, 2)
    return {
        "probe": "sssp",
        "factor": factor,
        "edges": n_edges,
        "dist_rows_per_round": relaxed_rows,
        "sec": sec,
    }


def freq_pairs_probe(spark, sf_dir, factor):
    """A-Priori bound evidence: candidate-pair rows entering the count
    aggregate are Σ_basket C(f_b, 2) where f_b counts FREQUENT brands
    only — replicating customers (disjoint ids) scales baskets linearly,
    so pair rows must scale linearly too (never quadratically in the
    corpus)."""
    o = _replicate_graph(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        factor,
        ["o_orderkey", "o_custkey"],
    )
    li = replicate(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        factor,
        "l_orderkey",
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    t0 = time.time()
    baskets = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("o_custkey", "p_brand")
        .distinct()
        .localCheckpoint()
    )
    n_baskets = baskets.select("o_custkey").distinct().count()
    rows = baskets.count()
    item = baskets.groupBy("p_brand").agg(F.count("*").alias("n_item"))
    minsup = n_baskets // 4
    freq = item.filter(F.col("n_item") >= minsup).select("p_brand")
    bf = baskets.join(F.broadcast(freq), "p_brand", "semi")
    a = bf.select(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("ba"))
    b = bf.select(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("bb"))
    cand_rows = a.join(b, ["ck"]).filter(F.col("ba") < F.col("bb")).count()
    sec = round(time.time() - t0, 2)
    return {
        "probe": "freq_pairs",
        "factor": factor,
        "baskets": n_baskets,
        "basket_rows": rows,
        "candidate_pair_rows": cand_rows,
        "pairs_per_basket": round(cand_rows / max(n_baskets, 1), 1),
        "sec": sec,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("probe_mining")
    spark.sparkContext.setLogLevel("ERROR")
    f = 1
    while f <= max_factor:
        for fn in (snm_probe, sssp_probe, freq_pairs_probe):
            print(json.dumps(fn(spark, sf_dir, f)), flush=True)
        f *= 4


if __name__ == "__main__":
    main()