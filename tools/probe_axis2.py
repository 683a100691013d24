"""Both-axes measurement for the five pair-based families (VERDICT r11
#6): run each family's driving-volume counters + wall on the axis-2
fixture (tools/gen_axis2.py: part vocab-GROWN, documents DENSIFIED) and
on the sf0.1 base, and record the per-axis scaling laws next to the
replication (gen_sf1) numbers already in SCALE_SF1:

| family | gen_sf1 axis (r11) | axis2 (this probe) | expected law |
|---|---|---|---|
| x_fuzzy_name_match | densification (pairs FACTOR^2) | vocabulary growth | DP pairs ~FACTOR x |
| e2_prefix_filter_pairs | vocab growth (10x clean) | densification | exchange ~FACTOR^2 x, df-cap engages |
| e2_containment_filter_pairs | vocab growth | densification | exchange ~FACTOR^2 x, df-cap engages |
| e2_sorted_neighborhood | vocab growth | densification | window pairs ~FACTOR x (rank window is linear BY CONSTRUCTION) |
| e2_lsh_candidate_pairs | vocab growth | densification | max_bucket cap engages; emitted pairs bounded |

The densification axis is the published worst case for exact set-
similarity joins — the OUTPUT is quadratic in copies (every copy pair
of a near-dup pair qualifies), so wall tracking the exchange is
optimal-for-the-semantics, and the caps are what keeps degenerate mass
(df explosions, mega-buckets) from taking the plan down with it.

Usage: python tools/probe_axis2.py [base_dir] [axis2_dir] [factor] [out]
Defaults: /root/testdata/sf0.1 scale_fixtures/axis2 4
          tools/probe_results/axis2_r12.jsonl
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


def fuzzy_counters(spark, sf_dir: str) -> dict:
    """Block / DP-pair volumes of the x_fuzzy_name_match blocking join
    (distinct-name level — the post-r12 collapsed frame — AND the
    row-level pair mass the oracle pays)."""
    p = load(spark, sf_dir, "part").select(
        F.lower(F.col("p_name")).alias("nm"),
        F.concat_ws(
            " ",
            F.split_part(F.lower(F.col("p_name")), F.lit(" "), F.lit(1)),
            F.split_part(F.lower(F.col("p_name")), F.lit(" "), F.lit(2)),
        ).alias("blk"),
    )
    blocks = p.groupBy("blk").agg(F.count("*").alias("m"))
    names = p.groupBy("blk", "nm").agg(F.count("*").alias("c"))
    nblocks = names.groupBy("blk").agg(F.count("*").alias("dn"))
    row = blocks.agg(
        F.count("*").alias("n_blocks"),
        F.sum("m").alias("rows"),
        F.max("m").alias("max_block"),
        F.sum(F.col("m") * (F.col("m") - 1)).alias("row_pairs"),
    ).first()
    drow = nblocks.agg(
        F.sum("dn").alias("distinct_names"),
        F.sum(F.col("dn") * (F.col("dn") - 1)).alias("name_pairs"),
    ).first()
    return {
        "n_blocks": row.n_blocks,
        "rows": row.rows,
        "max_block": row.max_block,
        "row_level_pairs": row.row_pairs,
        "distinct_names": drow.distinct_names,
        "name_level_dp_pairs": drow.name_pairs,
    }


def doc_counters(spark, sf_dir: str) -> dict:
    """Candidate-exchange + cap-engagement volumes for the document
    pair families (prefix / containment share the ranked front; LSH
    reports its oversized-bucket metrics; SNM pair count is linear by
    construction: rows * window)."""
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        BANDS,
        CPF_PCT,
        MAX_BUCKET,
        MAX_DF,
        N_HASHES,
        PF_PCT,
        SHINGLE_K,
    )

    docs = load(spark, sf_dir, "documents")
    sh = dedup.shingle_hashes_arrow(docs, "text", "doc_id", k=SHINGLE_K, spread=True)
    sh = sh.localCheckpoint(eager=False)
    dfs = sh.groupBy("sh").agg(F.count("*").alias("df"))
    cap = dfs.agg(
        F.count("*").alias("distinct_shingles"),
        F.sum(F.when(F.col("df") > MAX_DF, F.col("df")).otherwise(0)).alias(
            "postings_dropped_by_df_cap"
        ),
        F.sum(F.when(F.col("df") > MAX_DF, 1).otherwise(0)).alias(
            "shingles_over_df_cap"
        ),
    ).first()
    front = dedup.ranked_posting_stages(sh, max_df=MAX_DF, prepinned=True)
    pf = dedup.prefix_filter_stages(None, threshold_pct=PF_PCT, front=front)
    cf = dedup.containment_prefix_stages(None, threshold_pct=CPF_PCT, front=front)
    out = {
        "docs": docs.count(),
        "distinct_shingles": cap.distinct_shingles,
        "shingles_over_df_cap": cap.shingles_over_df_cap,
        "postings_dropped_by_df_cap": cap.postings_dropped_by_df_cap,
        "postings_kept": front["shingled"].count(),
        "pf_collided": pf["collided"].count(),
        "pf_cand": pf["cand"].count(),
        "cf_collided": cf["collided"].count(),
        "cf_cand": cf["cand"].count(),
    }
    # LSH banding with the hot-bucket cap measured from the bucket-size
    # distribution directly (the same groupBy the operator runs)
    sig = dedup.minhash_signatures_arrow(
        docs, "text", "doc_id", k=SHINGLE_K, n_hashes=N_HASHES, spread=True
    ).localCheckpoint(eager=False)
    pairs = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=MAX_BUCKET
    )
    out["lsh_candidate_pairs"] = pairs.count()
    banded = dedup._banded(sig, N_HASHES, BANDS)
    buckets = banded.groupBy("band_idx", "band_hash").agg(F.count("*").alias("m"))
    brow = buckets.agg(
        F.max("m").alias("max_bucket_size"),
        F.sum(F.when(F.col("m") > MAX_BUCKET, F.col("m")).otherwise(0)).alias(
            "rows_in_oversized"
        ),
        F.sum(F.when(F.col("m") > MAX_BUCKET, 1).otherwise(0)).alias(
            "oversized_buckets"
        ),
        F.sum(
            F.when(F.col("m") <= MAX_BUCKET, F.col("m") * (F.col("m") - 1) / 2)
            .otherwise(0)
        ).cast("long").alias("in_cap_pair_mass"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("long").alias(
            "uncapped_pair_mass"
        ),
    ).first()
    out["lsh_max_bucket_size"] = brow.max_bucket_size
    out["lsh_oversized_buckets"] = brow.oversized_buckets
    out["lsh_rows_in_oversized_buckets"] = brow.rows_in_oversized
    out["lsh_pair_mass_in_cap"] = brow.in_cap_pair_mass
    out["lsh_pair_mass_uncapped"] = brow.uncapped_pair_mass
    return out


def cap_ab(spark, sf_dir: str, tight_df: int = 50, tight_bucket: int = 30) -> dict:
    """Cap-engagement A/B on the densified fixture (VERDICT r11 #6:
    'blocking caps exercised on at least one'): the production caps
    (df<=1000, bucket<=1000) are sized for corpus-scale hot keys, which
    a 4x densification of a max-df-25 corpus cannot reach — so the A/B
    TIGHTENS the parameters the operators already expose and measures
    the defense engaging: postings dropped by the df cap, the prefix
    exchange shrinking, and LSH pair mass shed by the bucket cap.
    Probe-only parameterization; the registered queries keep the
    production caps (mirrored in their oracles)."""
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        BANDS,
        N_HASHES,
        PF_PCT,
        SHINGLE_K,
    )

    docs = load(spark, sf_dir, "documents")
    sh = dedup.shingle_hashes_arrow(
        docs, "text", "doc_id", k=SHINGLE_K, spread=True
    ).localCheckpoint(eager=False)
    loose = dedup.ranked_posting_stages(sh, max_df=None, prepinned=True)
    tight = dedup.ranked_posting_stages(sh, max_df=tight_df, prepinned=True)
    pf_loose = dedup.prefix_filter_stages(None, threshold_pct=PF_PCT, front=loose)
    pf_tight = dedup.prefix_filter_stages(None, threshold_pct=PF_PCT, front=tight)
    sig = dedup.minhash_signatures_arrow(
        docs, "text", "doc_id", k=SHINGLE_K, n_hashes=N_HASHES, spread=True
    ).localCheckpoint(eager=False)
    banded = dedup._banded(sig, N_HASHES, BANDS)
    buckets = banded.groupBy("band_idx", "band_hash").agg(F.count("*").alias("m"))
    brow = buckets.agg(
        F.sum(F.when(F.col("m") > tight_bucket, 1).otherwise(0)).alias("dropped"),
        F.sum(
            F.when(F.col("m") > tight_bucket, F.col("m") * (F.col("m") - 1) / 2)
            .otherwise(0)
        ).cast("long").alias("mass_shed"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("long").alias("mass_total"),
    ).first()
    lsh_capped = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=tight_bucket
    ).count()
    lsh_uncapped = dedup.lsh_candidate_pairs(
        sig, n_hashes=N_HASHES, bands=BANDS, max_bucket=1_000_000
    ).count()
    return {
        "tight_df": tight_df,
        "tight_bucket": tight_bucket,
        "postings_uncapped": loose["shingled"].count(),
        "postings_under_tight_df": tight["shingled"].count(),
        "pf_collided_uncapped": pf_loose["collided"].count(),
        "pf_collided_under_tight_df": pf_tight["collided"].count(),
        "lsh_buckets_dropped_by_tight_cap": brow.dropped,
        "lsh_pair_mass_shed": brow.mass_shed,
        "lsh_pair_mass_total": brow.mass_total,
        "lsh_pairs_capped": lsh_capped,
        "lsh_pairs_uncapped": lsh_uncapped,
    }


def timed(fn, spark, sf_dir: str, reps: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(reps):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return round(best, 2), rows


FAMILIES = [
    "x_fuzzy_name_match",
    "e2_prefix_filter_pairs",
    "e2_containment_filter_pairs",
    "e2_sorted_neighborhood",
    "e2_lsh_candidate_pairs",
]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    axis2 = sys.argv[2] if len(sys.argv) > 2 else "scale_fixtures/axis2"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_path = (
        sys.argv[4] if len(sys.argv) > 4 else "tools/probe_results/axis2_r12.jsonl"
    )
    spark = get_spark("probe_axis2")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    recs = []
    for sf_dir in (base, axis2):
        rec = {
            "sf": sf_dir,
            "factor": 1 if sf_dir == base else factor,
            "fuzzy": fuzzy_counters(spark, sf_dir),
            "docs": doc_counters(spark, sf_dir),
        }
        for name in FAMILIES:
            wall, rows = timed(queries[name], spark, sf_dir)
            rec[name] = {"wall_sec": wall, "rows_out": rows}
        recs.append(rec)
        print(json.dumps(rec))

    ab = {"sf": axis2, "cap_ab": cap_ab(spark, axis2)}
    recs.append(ab)
    print(json.dumps(ab))

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")
    s, b = recs[0], recs[1]
    print(f"\n--- axis2({factor}x) / sf0.1 ratios ---")
    for grp in ("fuzzy", "docs"):
        for k, v in b[grp].items():
            base_v = s[grp][k]
            if isinstance(v, (int, float)) and isinstance(base_v, (int, float)) and base_v:
                print(f"{grp}.{k}: {v / base_v:.2f}x   ({base_v} -> {v})")
            else:
                print(f"{grp}.{k}: {base_v} -> {v}")
    for q in FAMILIES:
        print(
            f"{q}: wall {b[q]['wall_sec'] / max(s[q]['wall_sec'], 0.01):.2f}x "
            f"({s[q]['wall_sec']} -> {b[q]['wall_sec']}), rows "
            f"{s[q]['rows_out']} -> {b[q]['rows_out']}"
        )


if __name__ == "__main__":
    main()
