"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect,
no result pruning) — the measured time is scan + compute + shuffle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    # batch analytics (TPC-H-style)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q18_large_orders",
    # reference-pipeline semantics
    "a1_group_count",
    "a2_latest_per_key",
    "a4_tombstone_latest",
    "j5_snapshot_assembly",
    "j6_asof_join",
    "cta_dashboard_snapshot",
    "w2_tumbling_hourly",
    "x_salted_agg",
    # LLM-data extensions
    "e1_exact_dedup",
    "e2_minhash_signatures",
    "e2_lsh_candidate_pairs",
    "e2_simhash",
    "e3_cosine_topk",
    "e4_token_counts",
    "e4_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm the JVM + parquet footers with one cheap query (not timed)
    queries["q6_forecast_revenue"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
