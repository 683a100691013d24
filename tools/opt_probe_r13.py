"""Round-12 optimization probe: targeted per-query timing + plan capture.

For each named query: run `reps` noop-sink executions (guide §1.4 — the
timed action computes every column and discards the result), print the
median/min/max, and optionally dump `.explain("formatted")` to
plans/r13/<query>_<suffix>.txt (the judge-readable plan evidence).

Usage:
  python tools/opt_probe_r13.py [--reps N] [--explain-suffix before|after]
                                [--sf DIR] query [query ...]

Timing methodology matches bench.py: one untimed warm-up query + a
mapInPandas pool warm before the first timed rep; queries run
round-robin so reps of one query are never adjacent.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain-suffix", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("opt_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for n in args.names:
        if n not in queries:
            sys.exit(f"unknown query: {n}")

    # warm-up (same preamble as bench.py)
    queries["q6_forecast_revenue"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

    if args.explain_suffix:
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
        )
        os.makedirs(out_dir, exist_ok=True)
        for n in args.names:
            df = queries[n](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{n}_{args.explain_suffix}.txt"), "w") as f:
                f.write(plan)

    walls: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.reps):
        for n in args.names:
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.time()
            queries[n](spark, args.sf).write.mode("overwrite").format("noop").save()
            walls[n].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    for n in args.names:
        ts = walls[n]
        print(
            f"{n}: median {statistics.median(ts):.3f}s "
            f"min {min(ts):.3f} max {max(ts):.3f} reps {[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
