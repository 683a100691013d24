"""Row-count sanity half of the sf1.0 scale gate (VERDICT r10 #1):
one representative query per family, counted at sf0.1 AND the
replicated sf1.0 fixture, checked against its expected scaling law.
The replication scheme (tools/gen_sf1.py: self-contained key universes
per copy, per-copy token bijection) makes the laws EXACT:

  x10 : per-row / per-entity outputs (projections, per-doc metering,
        per-copy-replicated dedup survivors and candidate pairs)
  x1  : fixed-cardinality outputs (group sets, window grids, top-k
        over a fixed query set)

Usage: python tools/rowcount_sanity.py [small_dir] [big_dir] [out.jsonl]
Writes tools/probe_results/rowcount_sf1_r11.jsonl by default; pinned
by tests/test_scale_sf1.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# query -> (expected rows multiplier across the 10x step, mode)
#   exact : rows_big == mult * rows_small — deterministic structure
#           replicates per copy
#   approx: within +-25% of mult * rows_small — probabilistic candidate
#           sets (the per-copy token bijection changes minhash VALUES,
#           so each copy's LSH collisions re-roll; similarity structure
#           is preserved but hash coincidences are copy-specific)
LAWS = {
    "q1_pricing_summary": (1, "exact"),       # fixed group count
    "w2_tumbling_hourly": (1, "exact"),       # fixed window grid
    "e3_cosine_topk": (1, "exact"),           # fixed query set x k
    "x_bitmap_distinct": (1, "exact"),        # fixed group count
    "e4_token_counts": (10, "exact"),         # per-doc row
    "p1_projection": (10, "exact"),           # per-row projection
    "e1_exact_dedup": (10, "exact"),          # per-copy dup structure
    "e2_lsh_candidate_pairs": (10, "approx"),  # hash-dependent candidates
    "e2_prefix_filter_pairs": (10, "exact"),  # exact pairs replicate
    "a2_latest_per_key": (10, "exact"),       # per-key rows, keys x10
}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "scale_fixtures/sf1.0"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "tools/probe_results/rowcount_sf1_r11.jsonl"
    )
    spark = get_spark("rowcount_sanity")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    lines = []
    for name, (mult, mode) in LAWS.items():
        t0 = time.time()
        n_small = queries[name](spark, small).count()
        n_big = queries[name](spark, big).count()
        if mode == "exact":
            ok = n_big == mult * n_small
        else:
            ok = abs(n_big - mult * n_small) <= 0.25 * mult * n_small
        rec = {
            "query": name,
            "rows_small": n_small,
            "rows_big": n_big,
            "expected_mult": mult,
            "mode": mode,
            "ok": ok,
            "sec": round(time.time() - t0, 1),
        }
        lines.append(rec)
        print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
    bad = [r["query"] for r in lines if not r["ok"]]
    print(json.dumps({"n": len(lines), "failures": bad}))
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
