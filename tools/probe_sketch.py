"""Scale probe for the mergeable-sketch family (round 9): replicate the
events corpus Nx with FRESH user ids (so the distinct domain grows Nx)
and record, per factor:

  - HLL: wall time, rows/sec, register-frame size (must stay <= 256 per
    scope at ANY scale — the whole point), relative estimation error
  - KMV: wall time, rows/sec, retained-hash count (must stay <= k),
    union/intersection relative error

Flat sketch sizes + linear-or-better rows/sec across 1x -> 4x -> 16x is
the local evidence that the sketch operators carry no hidden
corpus-proportional state — the property that makes them the 100 TB
path for distinct-count questions.

Usage: python tools/probe_sketch.py [sf_dir] [max_factor]
Appends one JSON line per (operator, factor) to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import sketch  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402


def replicate_events(events, factor: int):
    """Nx copies with disjoint user/event id ranges: the distinct-user
    domain grows Nx, so the sketches must summarize MORE, not re-count
    the same keys."""
    out = events
    copies = 1
    while copies < factor:
        out = out.unionByName(
            out.withColumn("user_id", F.col("user_id") + F.lit(10_000_000 * copies))
            .withColumn("event_id", F.col("event_id") + F.lit(1_000_000_000 * copies))
        )
        copies *= 2
    return out.localCheckpoint()  # pin: measure the sketch, not the union


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("probe_sketch")
    spark.sparkContext.setLogLevel("ERROR")
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "user_id")

    factor = 1
    while factor <= max_factor:
        d = replicate_events(events, factor)
        n_rows = d.count()

        # ---- HLL: per-event-type registers + estimate vs exact
        t0 = time.time()
        regs = sketch.hll_registers(d, ["event_type"], "user_id")
        est = sketch.hll_estimate(regs, ["event_type"]).collect()
        hll_wall = time.time() - t0
        reg_rows = regs.count()
        exact = {
            r["event_type"]: r["n"]
            for r in d.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        errs = [abs(r["est_hll"] - exact[r["event_type"]]) / exact[r["event_type"]] for r in est]
        print(json.dumps({
            "op": "hll_registers+estimate",
            "factor": factor,
            "rows": n_rows,
            "wall_sec": round(hll_wall, 3),
            "rows_per_sec": int(n_rows / hll_wall),
            "register_rows_total": reg_rows,
            "max_registers_per_scope": max(r["n_registers"] for r in est),
            "max_rel_err": round(max(errs), 4),
        }))

        # ---- KMV: bottom-k per half-domain + union estimate vs exact
        from pyspark.sql.window import Window

        from public_transit_status_with_apache_kafka_spark.functions.hashing import md5_long

        t0 = time.time()
        h = md5_long(F.col("user_id").cast("string"), salt="|kmv")
        hashes = d.select(
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("scope"),
            h.alias("h"),
        ).distinct()
        k = 64
        w = Window.partitionBy("scope").orderBy("h")
        sk = hashes.select(
            "scope", "h", F.row_number().over(w).alias("rnk")
        ).filter(F.col("rnk") <= k)
        retained = sk.count()
        kth = {r["scope"]: r["kth"] for r in sk.filter(F.col("rnk") == k)
               .select("scope", F.col("h").alias("kth")).collect()}
        kmv_wall = time.time() - t0
        exact_n = {r["scope"]: r["n"] for r in hashes.groupBy("scope")
                   .agg(F.count("*").alias("n")).collect()}
        rel = {}
        for scope, theta in kth.items():
            est_n = (k - 1) * (1 << 56) // theta
            rel[scope] = abs(est_n - exact_n[scope]) / exact_n[scope]
        print(json.dumps({
            "op": "kmv_bottom_k",
            "factor": factor,
            "rows": n_rows,
            "wall_sec": round(kmv_wall, 3),
            "rows_per_sec": int(n_rows / kmv_wall),
            "retained_rows_total": retained,
            "k": k,
            "max_rel_err": round(max(rel.values()), 4) if rel else None,
        }))
        factor *= 4


if __name__ == "__main__":
    main()
