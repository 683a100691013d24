"""Interleaved same-session A/B for the round-13 adaptive-partition
change (operators/rank._adaptive_partitions).

Arm A = adaptive (default $SPARK_GRAFT_RANK_PARTITION_BYTES);
Arm B = legacy flat defaultParallelism (forced by setting the target to
1 byte: ceil(size/1) always exceeds the cap).

Arms alternate rep by rep in ONE session, so host drift and JIT state
hit both equally — the only trustworthy comparison on this box
(OPTIMIZATION_r12.md "host drift" note).

Usage: python tools/ab_rank_r13.py [--reps N] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import rank  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("ab_rank_r13")
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
        for arm, env in (("adaptive", None), ("legacy", "1")):
            if env is None:
                os.environ.pop(rank._RANK_TARGET_BYTES_ENV, None)
            else:
                os.environ[rank._RANK_TARGET_BYTES_ENV] = env
            for n in args.names:
                spark.sparkContext.setJobDescription(f"ab:{arm}:{n}")
                t0 = time.time()
                queries[n](spark, args.sf).write.mode("overwrite").format("noop").save()
                walls.setdefault((n, arm), []).append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
    os.environ.pop(rank._RANK_TARGET_BYTES_ENV, None)
    for n in args.names:
        a = walls[(n, "adaptive")]
        b = walls[(n, "legacy")]
        print(
            f"{n}: adaptive med {statistics.median(a):.3f} "
            f"(reps {[round(t, 2) for t in a]}) | legacy med "
            f"{statistics.median(b):.3f} (reps {[round(t, 2) for t in b]})"
        )


if __name__ == "__main__":
    main()
