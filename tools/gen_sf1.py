"""Materialize an sf1.0-scale fixture set (VERDICT r10 #1): every
driver table replicated FACTOR x with consistent key remapping, so the
full 300-query registry can be benched against a uniform 10x data-size
step (sf0.1 -> sf1.0) — the cheapest honest proxy for the 100 TB design
claim this sandbox can produce.

Replication scheme (pure Spark, deterministic):
  - each copy c in [0, FACTOR) offsets every primary AND foreign key by
    c * OFF, so each copy is a self-contained join universe: per-key
    join fan-outs, group sizes, and selectivities are EXACTLY the
    sf0.1 ones, while totals scale linearly. OFF = 720720 * 1000 is
    divisible by every modulus 1..16 (and 20), so the registry's
    planted mod-based subsets (doc_id % 10, event_id % 10, vec_id % 3,
    ...) keep their per-copy membership structure.
  - nation/region stay single-copy (constant dims, the TPC-H stance);
    customer/supplier nation keys are left untouched so the dim joins
    keep their original fan-in.
  - documents: every token gets a per-copy prefix (c<i>_...). A
    per-copy token BIJECTION preserves within-copy shingle/similarity
    structure exactly (dedup selectivity per copy == sf0.1) while
    making cross-copy shingle sets DISJOINT — without it every doc
    would acquire FACTOR-1 near-identical twins and the exact pair
    joins would blow up quadratically in copies, measuring the fixture,
    not the operator. n_chars is recomputed from the transformed text.
  - embeddings: vectors copied as-is (exact duplicate vectors across
    copies — the realistic web-scale dedup shape; every ANN path is
    top-k bounded and semdedup sub-splits cells, so nothing goes
    quadratic). Only copy 0 has vec_id < 5, so ANN serve cost scales
    with the corpus at a FIXED query set.
  - events keep their timestamps: windows get FACTOR x rows per window
    (traffic growth), watermark/window counts stay bounded.

Usage: python tools/gen_sf1.py [out_dir] [factor] [src_dir]
Defaults: scale_fixtures/sf1.0 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

OFF = 720_720 * 1000  # divisible by every modulus 1..16 and by 20

# table -> columns that carry entity keys (offset per copy)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")


def replicate(df, key_cols, factor: int):
    copies = df.sparkSession.range(factor).select(F.col("id").alias("_copy"))
    out = df.crossJoin(F.broadcast(copies))
    for k in key_cols:
        dt = dict(df.dtypes)[k]
        out = out.withColumn(k, (F.col(k) + F.col("_copy") * F.lit(OFF)).cast(dt))
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "scale_fixtures/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("gen_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    t_all = time.time()
    for name in SINGLE_COPY:
        load(spark, src, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: single copy", flush=True)

    for name, keys in KEYED.items():
        df = load(spark, src, name)
        rep = replicate(df, keys, factor)
        if name == "documents":
            # per-copy token bijection (see module docstring); recompute
            # n_chars so length-based quality gates stay self-consistent
            toks = F.split(F.col("text"), " ")
            tagged = F.array_join(
                F.transform(
                    toks,
                    lambda t: F.concat(
                        F.lit("c"), F.col("_copy").cast("string"), F.lit("_"), t
                    ),
                ),
                " ",
            )
            rep = rep.withColumn("text", tagged).withColumn(
                "n_chars", F.length("text").cast(dict(df.dtypes)["n_chars"])
            )
        n_parts = max(4, min(32, factor * 4)) if name != "embeddings" else 4
        (
            rep.drop("_copy")
            .repartition(n_parts)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{name}.parquet")
        )
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n} rows ({factor}x)", flush=True)

    print(f"done in {time.time() - t_all:.1f}s -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
