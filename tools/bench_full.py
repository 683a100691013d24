"""Full-registry timing sweep (round-7 item #7): time EVERY registered
query ONCE at the bench SF — separate from bench.py's reps-based
headline medians — so a regression in an untimed query can't hide.
85 of 226 registered queries appear in the headline bench; this sweep
covers the rest (the TPC-H mid-range, the oracle long tail, the
streaming parity-encoded queries).

One rep per query is noisy (±30-50% on sub-second queries on this box);
the artifact is for ORDER-OF-MAGNITUDE regression catching — a 0.3 s
query that becomes 5 s — not round-over-round deltas (bench.py's warm
medians track those). The machine-speed calibration number is recorded
so cross-round reads divide by it.

Usage: python tools/bench_full.py [out.json]
Writes {"calib_sec": ..., "sf": ..., "n": ..., "total_sec": ...,
"queries": {name: sec | {"error": ...}}} and prints a short summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    sf_path = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_full")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # same warm-up + calibration preamble as bench.py
    queries["q6_forecast_revenue"](spark, sf_path).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql import functions as F

    def _calibrate() -> float:
        t0 = time.time()
        spark.range(200_000_000).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_003)))
        ).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    calib_sec = round(statistics.median([_calibrate() for _ in range(3)]), 3)

    results: dict[str, object] = {}
    t_all = time.time()

    def flush(total: float) -> dict:
        rec = {
            "metric": "full_registry_sweep",
            "sf": sf_path,
            "calib_sec": calib_sec,
            "n": len(results),
            "n_errors": sum(1 for v in results.values() if isinstance(v, dict)),
            "total_sec": total,
            "queries": results,
        }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        os.replace(tmp, out_path)
        return rec

    for name in sorted(queries):
        t0 = time.time()
        try:
            queries[name](spark, sf_path).write.mode("overwrite").format(
                "noop"
            ).save()
            results[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            results[name] = {"error": str(e).split("\n")[0][:200]}
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)
        flush(round(time.time() - t_all, 1))  # survive interruption

    # steady-state reps for the expensive tail (VERDICT r9 #2): one rep
    # is noisy enough to fake a 5x regression on untouched code
    # (x_positional_deletes 1.5->10.0 s in the r9 sweep, refuted by warm
    # reruns). Every entry over REP_THRESHOLD gets two more reps,
    # round-robin so no query benefits from back-to-back cache locality,
    # and its recorded value becomes the MEDIAN of all reps (the
    # singles stay in "reps" for the record).
    REP_THRESHOLD = 3.0
    # cross-round riser re-rep (VERDICT r10 #3): the 3 s floor exempted
    # sub-3 s entries from the medians machinery, so a single-rep
    # phantom like x_decimal_agg 0.66->2.28 s on untouched code could
    # not self-refute. Load the newest prior sweep AT THE SAME SF and
    # re-rep ANY entry whose ratio vs it exceeds 2x, regardless of
    # absolute time.
    import glob

    prev_rec, prev_path = None, None
    candidates = [
        p for p in sorted(glob.glob("BENCH_FULL_*local.json"))
        if os.path.abspath(p) != os.path.abspath(out_path)
    ]
    for p in reversed(candidates):
        try:
            with open(p) as f:
                rec_p = json.load(f)
            if rec_p.get("sf") == sf_path and rec_p.get("queries"):
                prev_rec, prev_path = rec_p, p
                break
        except (OSError, json.JSONDecodeError):
            continue

    cross_round_risers: list[str] = []
    if prev_rec is not None:
        prev_q = prev_rec["queries"]
        for n, v in results.items():
            pv = prev_q.get(n)
            if (
                isinstance(v, float) and isinstance(pv, (int, float))
                and pv > 0 and v / pv > 2.0 and v <= REP_THRESHOLD
            ):
                cross_round_risers.append(n)
        cross_round_risers.sort()

    risers = sorted(
        set(cross_round_risers)
        | {
            n for n, v in results.items()
            if isinstance(v, float) and v > REP_THRESHOLD
        }
    )
    reps: dict[str, list[float]] = {n: [results[n]] for n in risers}

    def run_rep(name: str) -> None:
        t0 = time.time()
        try:
            queries[name](spark, sf_path).write.mode("overwrite").format(
                "noop"
            ).save()
            reps[name].append(round(time.time() - t0, 3))
        except Exception:  # noqa: BLE001 — keep the single-rep value
            pass

    for _ in range(2):
        for name in risers:
            run_rep(name)
    # adaptive extension: a 3-rep median can still carry a cold/loaded
    # outlier (the main-sweep value is rep 0 and often the coldest).
    # While an entry's spread exceeds 50% of its median, add reps round-
    # robin up to 6 total — the median then sits on the steady state.
    for _ in range(3):
        unstable = [
            n for n in risers
            if len(reps[n]) < 6
            and (max(reps[n]) - min(reps[n]))
            > 0.5 * statistics.median(reps[n])
        ]
        if not unstable:
            break
        for name in unstable:
            run_rep(name)
    for name, vals in reps.items():
        results[name] = round(statistics.median(vals), 3)
        print(f"rep-median {name}: {vals} -> {results[name]}",
              file=sys.stderr, flush=True)

    total = round(time.time() - t_all, 1)
    rec_extra = {n: v for n, v in reps.items()}

    # self-normalizing artifact (VERDICT r10 #5): embed the in-sweep
    # host factor vs the newest prior same-SF sweep so cross-round
    # readers don't need a separate bench_normalize.py pass + two files
    host_norm = None
    if prev_rec is not None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_normalize import host_factor  # same dir as this script

        hf = host_factor(prev_rec["queries"], results)
        if hf is not None:
            host_norm = {
                "vs": os.path.basename(prev_path),
                "factor": round(hf["factor"], 4),
                "iqr_pct": round(hf["iqr_pct"], 1),
                "pool_iqr_pct": round(hf["pool_iqr_pct"], 1),
                "n": hf["n"],
                "n_pool": hf["n_pool"],
            }

    def flush_final(total: float) -> None:
        rec = {
            "metric": "full_registry_sweep",
            "sf": sf_path,
            "calib_sec": calib_sec,
            "n": len(results),
            "n_errors": sum(1 for v in results.values() if isinstance(v, dict)),
            "total_sec": total,
            "rep_threshold_sec": REP_THRESHOLD,
            "cross_round_rep_ratio": 2.0,
            "cross_round_risers": cross_round_risers,
            "host_factor_vs_prev": host_norm,
            "reps": rec_extra,
            "queries": results,
        }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        os.replace(tmp, out_path)

    flush_final(total)
    timed = {k: v for k, v in results.items() if isinstance(v, float)}
    top = sorted(timed.items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({"n": len(results), "total_sec": total,
                      "calib_sec": calib_sec, "slowest": top}))


if __name__ == "__main__":
    main()
