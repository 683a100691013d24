"""A/B scale probe: bitmap-word exact distinct vs COUNT(DISTINCT).

Replicates orders 1x/4x/16x with SHIFTED customer-id domains (both the
row count and the id domain scale, the honest regime for the bitmap),
then times per factor:

  A. bitmap path (operators/bitmap.bitmap_words + distinct_counts)
  B. Spark COUNT(DISTINCT) (two-stage distinct aggregation w/ Expand)

and records the exchange-size driver for each: the bitmap shuffles
n_words = O(|domain|/32 x groups) rows; count-distinct shuffles the
deduplicated (group, id) pair multiset. Writes JSON to
tools/probe_results/bitmap_distinct_r07.json and prints a summary row
per factor. Run on an otherwise-idle box (timings are medians of 3
warm runs after one discard).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import bitmap  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 16)
DOMAIN_STRIDE = 1_000_000  # shift per replica so the id domain scales too


def replicate(o, factor: int):
    parts = [
        o.select(
            (F.col("o_custkey") + i * DOMAIN_STRIDE).alias("id"),
            F.col("o_orderpriority").alias("g"),
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, reps: int = 3) -> float:
    fn()  # discard: JIT/cache warm
    return round(statistics.median(timeit(fn) for _ in range(reps)), 3)


def timeit(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark("exp_bitmap", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    o = load(spark, SF_DIR, "orders")
    results = []
    for f in FACTORS:
        df = replicate(o, f).localCheckpoint()  # isolate input build cost
        n_rows = df.count()

        def run_bitmap():
            bitmap.distinct_counts(
                bitmap.bitmap_words(df, ["g"], "id"), ["g"]
            ).write.mode("overwrite").format("noop").save()

        def run_count_distinct():
            df.groupBy("g").agg(
                F.countDistinct("id").alias("n_distinct"),
                F.count("*").alias("n_rows"),
            ).write.mode("overwrite").format("noop").save()

        n_words = bitmap.bitmap_words(df, ["g"], "id").count()
        n_pairs = df.select("g", "id").distinct().count()
        rec = {
            "factor": f,
            "n_rows": n_rows,
            "bitmap_sec": timed(run_bitmap),
            "count_distinct_sec": timed(run_count_distinct),
            "bitmap_exchange_rows": n_words,
            "count_distinct_exchange_rows": n_pairs,
        }
        results.append(rec)
        print(rec)
    out = {
        "sf_dir": SF_DIR,
        "domain_stride": DOMAIN_STRIDE,
        "note": (
            "times are medians of 3 warm runs (noop sink) after one "
            "discard; exchange rows = words vs deduped (group,id) pairs"
        ),
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "probe_results",
        "bitmap_distinct_r07.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
