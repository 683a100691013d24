"""Interleaved fronts-ON vs fronts-OFF A/B over the shared-front E2/E8
families (VERDICT r12 #6 done-criterion: record sf1.0 behavior with the
shared fronts on AND off).

Arms alternate rep-by-rep in ONE session; the OFF arm sets
$SPARK_GRAFT_NO_SHARED_FRONTS so every query computes its own front
(the unshared shapes), the ON arm uses the session memo (whichever ON
query runs first pays the build). Reported per query and as family
totals — the honest unit for the shared-front families.

Usage: python tools/ab_fronts_sf1.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402
from public_transit_status_with_apache_kafka_spark.plans import llm_data  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

FAMILY = [
    # E2 shared sig/sh/pairs consumers + the two front-identity queries
    "e2_minhash_signatures",
    "e2_lsh_candidate_pairs",
    "e2_lsh_pairs_salted",
    "e2_pair_graph_triangles",
    "e2_pair_graph_kcore",
    "e2_minhash_calibration",
    "e2_similarity_histogram",
    "e2_containment_topk",
    "e6_contrastive_pairs",
    # E8 shared tf/dl consumers
    "e8_inverted_index",
    "e8_bm25_topk",
    "e8_hybrid_rrf",
    "e8_prf_expansion",
    "e8_index_compaction",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "scale_fixtures/sf1.0")
    )
    args = ap.parse_args()

    spark = get_spark("ab_fronts_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    queries["q6_forecast_revenue"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

    walls: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.reps):
        for arm, env in (("fronts_on", None), ("fronts_off", "1")):
            if env is None:
                os.environ.pop(llm_data._FRONT_DISABLE_ENV, None)
            else:
                os.environ[llm_data._FRONT_DISABLE_ENV] = env
            for n in FAMILY:
                spark.sparkContext.setJobDescription(f"ab:{arm}:{n}")
                t0 = time.time()
                queries[n](spark, args.sf).write.mode("overwrite").format("noop").save()
                walls.setdefault((n, arm), []).append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
    os.environ.pop(llm_data._FRONT_DISABLE_ENV, None)

    tot = {"fronts_on": 0.0, "fronts_off": 0.0}
    for n in FAMILY:
        row = []
        for arm in ("fronts_on", "fronts_off"):
            med = statistics.median(walls[(n, arm)])
            tot[arm] += med
            row.append(f"{arm} med {med:.2f} (reps {[round(t, 2) for t in walls[(n, arm)]]})")
        print(f"{n}: " + " | ".join(row))
    print(
        f"FAMILY TOTAL (medians): fronts_on {tot['fronts_on']:.2f}s | "
        f"fronts_off {tot['fronts_off']:.2f}s"
    )


if __name__ == "__main__":
    main()
