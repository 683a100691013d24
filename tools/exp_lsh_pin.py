"""Experiment (round 5): which lineage-control strategy is cheapest for
the twice-consumed banded stream in lsh_candidate_pairs?

Strategies (NOTE: in PySpark, StorageLevel.MEMORY_AND_DISK is the
SERIALIZED level and MEMORY_AND_DISK_DESER the deserialized one —
labels below name the actual level, fixing the round-5 first cut
which had the last two arms cross-labeled):
  ckpt    — localCheckpoint(eager=False)   (round-4 shape)
  persist — persist(MEMORY_AND_DISK)       (serialized; matches the
            production pin="persist" knob in dedup.lsh_candidate_pairs)
  deser   — persist(MEMORY_AND_DISK_DESER)
  none    — no pin: the signature pipeline re-executes for the probe side

Run: python tools/exp_lsh_pin.py [sf_dir] [reps]
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.io_util import load
from public_transit_status_with_apache_kafka_spark.operators import dedup
from public_transit_status_with_apache_kafka_spark.operators.dedup import _banded, md5_long
from public_transit_status_with_apache_kafka_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N_HASHES, BANDS, MAX_BUCKET, SHINGLE_K = 6, 3, 1000, 3


def pairs(spark, mode: str, oversize: str):
    sig = dedup.minhash_signatures_arrow(
        load(spark, SF, "documents"), "text", "doc_id",
        k=SHINGLE_K, n_hashes=N_HASHES, spread=True,
    )
    banded = _banded(sig, N_HASHES, BANDS)
    pinned = None
    if mode == "ckpt":
        banded = banded.localCheckpoint(eager=False)
    elif mode == "persist":
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
        pinned = banded
    elif mode == "deser":
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        pinned = banded
    sizes = banded.groupBy("band_idx", "band_hash").agg(F.count("*").alias("m"))
    hot = sizes.filter(F.col("m") > MAX_BUCKET)
    if oversize == "drop":
        bounded = banded.join(
            F.broadcast(hot.select("band_idx", "band_hash")),
            ["band_idx", "band_hash"], "left_anti",
        )
        keys = ["band_idx", "band_hash"]
    else:
        n_subs = F.ceil(F.col("m") / MAX_BUCKET).cast("long")
        bounded = (
            banded.join(F.broadcast(hot), ["band_idx", "band_hash"], "left")
            .withColumn(
                "sub",
                F.when(F.col("m").isNull(), F.lit(0)).otherwise(
                    F.pmod(md5_long(F.col("id").cast("string")), n_subs)
                ),
            )
            .drop("m")
        )
        keys = ["band_idx", "band_hash", "sub"]
    buckets = (
        bounded.groupBy(*keys)
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    out = (
        buckets.select(F.posexplode("ids").alias("i", "id_a"), "ids")
        .select(
            "id_a",
            F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias("id_b"),
        )
        .distinct()
    )
    return out, pinned


def main():
    spark = get_spark("exp_lsh_pin")
    spark.sparkContext.setLogLevel("ERROR")
    # warm workers
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    results = {}
    counts = {}
    for oversize in ["drop", "salt"]:
        for mode in ["ckpt", "persist", "deser", "none"]:
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                df, pinned = pairs(spark, mode, oversize)
                df.write.mode("overwrite").format("noop").save()
                ts.append(time.time() - t0)
                if pinned is not None:
                    pinned.unpersist()
            n = pairs(spark, mode, oversize)[0].count()
            counts[(oversize, mode)] = n
            results[(oversize, mode)] = ts
            print(
                f"{oversize:5s} {mode:8s} med={statistics.median(ts):.3f} "
                f"min={min(ts):.3f} max={max(ts):.3f} rows={n}",
                flush=True,
            )
    base = {o: counts[(o, "ckpt")] for o in ["drop", "salt"]}
    for (o, m), n in counts.items():
        assert n == base[o], (o, m, n, base[o])
    print("row counts identical across strategies")


if __name__ == "__main__":
    main()
