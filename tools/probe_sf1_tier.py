"""Measured diagnosis of the 4-7x sf1.0 tier (VERDICT r11 #2): the
five queries whose sf0.1 -> sf1.0 wall ratio sat between 4x and the
15x superlinear threshold. For each, record the DRIVING VOLUME at both
SFs next to the wall, so the ratio is attributable to measured work
growth rather than guessed:

- e2_prefix_filter_pairs / e2_containment_filter_pairs: the candidate-
  exchange ladder (postings after the df cap, prefix rows entering the
  self-join, colliding token rows, post-positional-bound candidates,
  final verified pairs). The sf1.0 fixture's per-copy token bijection
  makes cross-copy shingle sets disjoint, so every stage should grow
  ~10x (per-copy structure identical x 10 copies): wall growing LESS
  than the exchange is the sublinear-scaling evidence.
- e6_quality_gate: document rows in / rows kept (per-doc scoring +
  two-pass distributed rank — work is linear in rows by shape).
- e5_media_dir_ingest: media files on disk + bytes (one .bmp + one
  .wav per subset doc; binaryFile small-file IO is linear in files).
- x3_stream_skyline: lineitem rows ingested + frontier size (per-batch
  fold cost is batch + frontier, history never rescans; the delivery
  parquet write/stream-read is linear in rows).

Usage: python tools/probe_sf1_tier.py [small_dir] [big_dir] [out.jsonl]
Defaults: /root/testdata/sf0.1 scale_fixtures/sf1.0
          tools/probe_results/sf1_tier_r12.jsonl
Prints one JSON line per (query, sf) measurement and writes them all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from public_transit_status_with_apache_kafka_spark.io_util import load  # noqa: E402
from public_transit_status_with_apache_kafka_spark.operators import dedup  # noqa: E402
from public_transit_status_with_apache_kafka_spark.session import get_spark  # noqa: E402


def pair_ladder(spark, sf_dir: str) -> dict:
    """Candidate-exchange stage counts for BOTH exact set-similarity
    joins (they share the ranked-posting front, like the queries)."""
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        CPF_PCT,
        MAX_DF,
        PF_PCT,
        SHINGLE_K,
    )

    docs = load(spark, sf_dir, "documents")
    sh = dedup.shingle_hashes_arrow(docs, "text", "doc_id", k=SHINGLE_K, spread=True)
    front = dedup.ranked_posting_stages(sh, max_df=MAX_DF)
    pf = dedup.prefix_filter_stages(None, threshold_pct=PF_PCT, front=front)
    cf = dedup.containment_prefix_stages(None, threshold_pct=CPF_PCT, front=front)
    return {
        "docs": docs.count(),
        "postings": front["shingled"].count(),
        "pf_prefix_rows": pf["prefix"].count(),
        "pf_collided": pf["collided"].count(),
        "pf_bounded": pf["collided_bounded"].count(),
        "pf_cand": pf["cand"].count(),
        "cf_collided": cf["collided"].count(),
        "cf_bounded": cf["collided_bounded"].count(),
        "cf_cand": cf["cand"].count(),
    }


def timed(fn, spark, sf_dir: str, reps: int = 2) -> tuple[float, int]:
    """Warm wall (min of reps) + output rows."""
    best, rows = float("inf"), 0
    for _ in range(reps):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return round(best, 2), rows


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "scale_fixtures/sf1.0"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "tools/probe_results/sf1_tier_r12.jsonl"
    )
    spark = get_spark("probe_sf1_tier")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    recs = []

    for sf_dir in (small, big):
        rec = {"sf": sf_dir, "ladder": pair_ladder(spark, sf_dir)}
        for name in ("e2_prefix_filter_pairs", "e2_containment_filter_pairs"):
            wall, rows = timed(queries[name], spark, sf_dir)
            rec[name] = {"wall_sec": wall, "pairs_out": rows}
        wall, rows = timed(queries["e6_quality_gate"], spark, sf_dir)
        rec["e6_quality_gate"] = {
            "wall_sec": wall,
            "docs_in": rec["ladder"]["docs"],
            "rows_kept": rows,
        }
        wall, rows = timed(queries["e5_media_dir_ingest"], spark, sf_dir, reps=1)
        # count the on-disk files the ingest reads (the driving volume)
        from public_transit_status_with_apache_kafka_spark.plans import llm_data

        n_files = total_bytes = 0
        import glob
        import hashlib

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tag = hashlib.md5(
            f"{os.path.abspath(sf_dir)}|{llm_data._MEDIA_SUBSET}|mediadir:v1".encode()
        ).hexdigest()[:10]
        for p in glob.glob(
            os.path.join(repo, "spark-warehouse", "media_dir", tag, "*", "*")
        ):
            n_files += 1
            total_bytes += os.path.getsize(p)
        rec["e5_media_dir_ingest"] = {
            "wall_sec": wall,
            "n_files": n_files,
            "total_bytes": total_bytes,
        }
        wall, rows = timed(queries["x3_stream_skyline"], spark, sf_dir, reps=1)
        rec["x3_stream_skyline"] = {
            "wall_sec": wall,
            "lineitem_rows": load(spark, sf_dir, "lineitem").count(),
            "frontier_rows": rows,
        }
        recs.append(rec)
        print(json.dumps(rec))

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")
    # ratio summary
    s, b = recs
    print("\n--- sf1.0 / sf0.1 ratios ---")
    for k, v in b["ladder"].items():
        print(f"ladder.{k}: {v / max(s['ladder'][k], 1):.2f}x")
    for q in (
        "e2_prefix_filter_pairs",
        "e2_containment_filter_pairs",
        "e6_quality_gate",
        "e5_media_dir_ingest",
        "x3_stream_skyline",
    ):
        print(f"{q}: wall {b[q]['wall_sec'] / max(s[q]['wall_sec'], 0.01):.2f}x")


if __name__ == "__main__":
    main()
