"""Scale probe: replicate the sf0.1 documents corpus Nx (distinct ids)
and measure the E1/E2 kernels' throughput at each scale. Linear-or-better
rows/sec across 1x -> 4x -> 16x is the local evidence that the operator
has no hidden quadratic or driver-side bottleneck; the absolute numbers
also show where JVM/task-scheduling overhead stops dominating.

Usage: python tools/scale_probe.py [sf_dir] [max_factor]
Prints one JSON line per (operator, factor).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import dedup, pca, similarity, text  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402


def _heavy_hitters(docs):
    from public_transit_status_with_apache_kafka_spark.operators.sketch import heavy_hitters

    toks = docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
    return heavy_hitters(toks, "tok", k=10)


def replicate(docs, factor: int, id_col: str = "doc_id"):
    out = docs
    copies = 1
    while copies < factor:
        out = out.unionByName(
            out.withColumn(id_col, F.col(id_col) + F.lit(100_000_000 * copies))
        )
        copies *= 2
    return out.localCheckpoint()  # pin: measure the operator, not the union


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    ops = {
        "e1_exact_dedup": lambda d: dedup.exact_dedup(d, "text", "doc_id"),
        "e2_minhash_arrow": lambda d: dedup.minhash_signatures_arrow(
            d, "text", "doc_id", k=3, n_hashes=6
        ),
        "e2_simhash_arrow": lambda d: dedup.simhash_arrow(d, "text", "doc_id", bits=16),
        "e2_lsh_pairs": lambda d: dedup.lsh_candidate_pairs(
            dedup.minhash_signatures_arrow(d, "text", "doc_id", k=3, n_hashes=6),
            n_hashes=6,
            bands=3,
        ),
        "e4_segment_dedup": lambda d: text.segment_dedup(d, "text", "doc_id"),
        "e4_dup_ngram_frac": lambda d: text.dup_ngram_fraction(d, "text", "doc_id"),
        "e4_bigram_logprob": lambda d: text.bigram_logprob(d, "text", "doc_id"),
        "e4_top_ngram_frac": lambda d: text.top_ngram_fraction_arrow(
            d, "text", "doc_id"
        ),
        "x_heavy_hitters": lambda d: _heavy_hitters(d),
        # round-5: DSIR weights — the bucket tables stay B rows at any
        # factor, so rows/sec must hold (the broadcast side is constant)
        "e4_dsir_weights": lambda d: text.dsir_weights(
            d.filter(F.col("doc_id") % 20 != 0),
            d.filter(F.col("doc_id") % 20 == 0),
            "text",
            "doc_id",
        ),
        # round-6: exact-substring dedup — window stream + one
        # partial-aggregable frequency groupBy + per-doc span math;
        # replication makes EVERY window a duplicate (worst case for
        # the dup join-back side)
        "e4_substring_dedup": lambda d: text.substring_dedup(d, "text", "doc_id"),
    }

    from public_transit_status_with_apache_kafka_spark.operators import urls

    def _with_source(d):
        return d.withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
        )

    # round-6: canonical-URL dedup — regexp canonicalization is
    # map-side; the groupBy key is the canonical string
    ops["e1_url_dedup"] = lambda d: urls.url_dedup(
        urls.synthetic_urls(_with_source(d))
    )

    from public_transit_status_with_apache_kafka_spark.operators import rank as rankops

    # round-6: the distributed-rank family — a 5-value stratum at 16x is
    # exactly the shape the per-stratum window collapses on (entire
    # stratum -> one task); here per-task work must stay ~rows/n_parts
    # and the pass-1 collect stays n_parts x |strata| rows at any factor
    ops["x_stratified_rank"] = lambda d: rankops.stratified_rank(
        d.select(
            "doc_id",
            (F.col("doc_id") % 5).cast("string").alias("s"),
            F.length("text").alias("v"),
        ),
        ["s"],
        ["v", "doc_id"],
    )
    ops["e6_stratified_cumsum"] = lambda d: rankops.stratified_cumsum(
        d.select(
            "doc_id",
            (F.col("doc_id") % 8).alias("shard"),
            F.length("text").alias("v"),
        ),
        ["shard"],
        ["doc_id"],
        "v",
    )
    from public_transit_status_with_apache_kafka_spark.operators.asof import (
        stratified_asof,
    )

    def _asof_probe(d):
        ids = d.select("doc_id")
        left = ids.select(
            "doc_id",
            (F.col("doc_id") % 5).cast("string").alias("k"),
            (F.col("doc_id") * 7).alias("t"),
        )
        right = (
            ids.filter(F.col("doc_id") % 11 == 0)
            .select(
                (F.col("doc_id") % 5).cast("string").alias("rk"),
                (F.col("doc_id") * 7 + 3).alias("rt"),
                (F.col("doc_id") % 97).cast("double").alias("ref"),
            )
            .groupBy("rk", "rt")
            .agg(F.max("ref").alias("ref"))
        )
        return stratified_asof(left, right, "k", "rk", "t", "rt", ["ref"])

    ops["j8_stratified_asof"] = _asof_probe

    from public_transit_status_with_apache_kafka_spark.operators import graph as graphops

    # round-6: triangle census — replication makes disjoint graph copies,
    # so edges AND triangles grow linearly; the degree orientation must
    # keep the wedge join linear too (no deg^2 blowup on hot buckets)
    ops["e2_pair_graph_triangles"] = lambda d: graphops.triangle_stats(
        dedup.lsh_candidate_pairs(
            dedup.minhash_signatures_arrow(d, "text", "doc_id", k=3, n_hashes=6),
            n_hashes=6,
            bands=3,
        )
    )
    ops["x_stratified_lead"] = lambda d: rankops.stratified_lead(
        d.select(
            "doc_id",
            (F.col("doc_id") % 5).cast("string").alias("s"),
            F.length("text").alias("v"),
        ),
        ["s"],
        ["doc_id"],
        ["v"],
    )

    # round-6 additions
    # PMI: count tables stay vocabulary-sized at any factor; occurrence
    # streams scale linearly and collapse before the joins
    ops["e4_pmi_collocations"] = lambda d: text.pmi_collocations(d, "text")

    # k-core: like the triangle probe, replication densifies the pair
    # graph into 16-cliques — the dense worst case for the peel's
    # degree counts (everything survives, fixpoint in few rounds)
    def _kcore_probe(d):
        nodes, _rounds = graphops.k_core(
            dedup.lsh_candidate_pairs(
                dedup.minhash_signatures_arrow(d, "text", "doc_id", k=3, n_hashes=6),
                n_hashes=6,
                bands=3,
            ),
            k=2,
        )
        return nodes

    ops["e2_pair_graph_kcore"] = _kcore_probe

    from public_transit_status_with_apache_kafka_spark.operators import semdedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb_ops = {
        # max_cell well under the hot-cell sizes at 16x so the sub-split
        # path (the skew bound) is what gets measured
        "e2_semdedup": lambda d: semdedup.semdedup_summary(
            d, k=8, iters=2, tau=0.9, max_cell=512
        ),
        # round-5: exact-int covariance — shuffle width is constant
        # (partitions * dim^2/2 rows) so scaling is pure map-side matmul
        "e3_embedding_covariance": lambda d: pca.second_moments(d, dim=64),
        # round-5: binary-Hamming ANN — integer codegen scan, bounded
        # probe side broadcast; must scale as a pure corpus pass
        "e3_hamming_topk": lambda d: similarity.hamming_topk(
            d.filter(F.col("vec_id") < 5), d, dim=64, k=3
        ),
    }

    # salted replicate for the EXACT similarity join: plain replication
    # makes every copy a true duplicate, so the correct answer itself
    # grows quadratically in the factor — that measures the problem, not
    # the operator. Per-copy character rotations keep each copy's
    # planted near-dups intact while collapsing cross-copy similarity,
    # so qualifying pairs (and the honest work) grow linearly. One
    # canonical implementation (with the factor-8 wraparound fix):
    from tools.probe_prefix_filter import salted_replicate

    def _prefix_pairs_probe(d):
        sh = dedup.shingle_hashes_arrow(d, "text", "doc_id", k=3)
        return dedup.prefix_filter_pairs(sh, threshold_pct=40)

    salted_ops = {"e2_prefix_filter_pairs": _prefix_pairs_probe}

    # interval-table probe for the bucketized range join: replicate the
    # (start_d, end_d) windows — the calendar stays month-cardinality,
    # so rows/sec must hold as pure explode+hash-join throughput
    from public_transit_status_with_apache_kafka_spark.plans.relational import (
        backlog_snapshots,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_d")
    )
    ls = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("end_d"))
    )
    win0 = (
        o.join(ls, o.o_orderkey == ls.l_orderkey)
        .select("o_orderkey", "start_d", "end_d")
        .filter(F.col("end_d") >= F.col("start_d"))
    )
    win_ops = {"x_range_join_buckets": backlog_snapshots}

    factor = 1
    while factor <= max_factor:
        big = replicate(docs, factor)
        n = big.count()
        big_emb = replicate(emb, factor, id_col="vec_id")
        n_emb = big_emb.count()
        big_salted = salted_replicate(docs, factor)
        n_salted = big_salted.count()
        big_win = replicate(win0, factor, id_col="o_orderkey")
        n_win = big_win.count()
        for src_rows, src_ops, frame in (
            (n, ops, big),
            (n_emb, emb_ops, big_emb),
            (n_salted, salted_ops, big_salted),
            (n_win, win_ops, big_win),
        ):
            for name, fn in src_ops.items():
                fn(frame).write.mode("overwrite").format("noop").save()  # warm
                t0 = time.time()
                fn(frame).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                print(
                    json.dumps(
                        {
                            "op": name,
                            "factor": factor,
                            "rows": src_rows,
                            "sec": round(dt, 3),
                            "rows_per_sec": int(src_rows / dt),
                        }
                    )
                )
        factor *= 4


if __name__ == "__main__":
    main()
