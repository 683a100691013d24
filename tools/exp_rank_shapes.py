"""Interleaved A/B: per-stratum WINDOW forms vs the round-6 DISTRIBUTED
rank-family forms, at sf0.1 on local[32].

The distributed forms exist for the 100x design point (a window
partitioned by a handful of strata sorts each stratum's whole corpus
slice in ONE task; the two-pass range-partitioned forms spread that
across the cluster). At sf0.1 single-node, the window form has a real
head start — no second pass, no driver collect, no Python kernel — so
this experiment records the LOCAL price actually paid for the
scale-safe shape, the same measured-tradeoff methodology as
tools/exp_lsh_pin.py. Reps interleave (A B A B ...) so neither side
benefits from cache locality; medians reported.

Run: python tools/exp_rank_shapes.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def window_ntile(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


def window_locf(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    v = F.when(F.col("value") < 5.0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select("event_id", "event_type", "ts", v.alias("v")).select(
        "event_id",
        "event_type",
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("filled"),
    )


def window_packing(spark, sf_dir):
    # same shard count and bin budget as the registered distributed
    # form — mismatched constants would change the aggregate
    # cardinality and skew the A/B
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        _PACK_BUDGET,
        _PACK_SHARDS,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = docs.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("doc_id").alias("id_checksum"),
    )


def window_gaps(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias(
        "gap_ms"
    )
    return (
        ev.select("event_type", gap)
        .filter(F.col("gap_ms").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n_gaps"), F.max("gap_ms").alias("max_gap_ms"))
    )


PAIRS = {
    # label: (window form, registered distributed form)
    "ntile": (window_ntile, "x_ntile_bucketing"),
    "locf": (window_locf, "x_locf_fill"),
    "packing": (window_packing, "e6_sequence_packing"),
    "gaps": (window_gaps, "x_event_gaps"),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("exp_rank_shapes")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # worker-pool warm-up (the distributed forms use mapInPandas)
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    def run(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for label, (win_fn, dist_name) in PAIRS.items():
        run(win_fn(spark, sf_dir))  # warm both plans once, untimed
        run(queries[dist_name](spark, sf_dir))
        a, b = [], []
        for _ in range(reps):
            a.append(run(win_fn(spark, sf_dir)))
            b.append(run(queries[dist_name](spark, sf_dir)))
        print(
            json.dumps(
                {
                    "pair": label,
                    "window_sec": round(statistics.median(a), 3),
                    "distributed_sec": round(statistics.median(b), 3),
                    "local_overhead_x": round(
                        statistics.median(b) / statistics.median(a), 2
                    ),
                    "reps": reps,
                }
            )
        )


if __name__ == "__main__":
    main()
