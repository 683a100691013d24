"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect,
no result pruning) — the measured time is scan + compute + shuffle.

Methodology (VERDICT r1 item 3): single-shot numbers on this box are
JIT/cold-cache dominated (±30-50% run-to-run). So after one untimed
warm-up query, each headline query runs once cold, then
$SPARK_GRAFT_BENCH_REPS (default 3) warm repetitions, round-robin so
no query benefits from back-to-back cache locality. The headline
"value"/"queries" fields are WARM MEDIANS (the number that tracks code
changes round-over-round); the cold pass and per-query repeat spread
are kept alongside for the record.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "e3_quantize_int8",
    "e4_token_counts",
    "e4_quality_score",
    "e4_unigram_logprob",
    "e4_contamination_check",
    "e4_pii_scan",
    "e4_winnowing_fingerprints",
    # round-3 additions
    "e2_lsh_pairs_salted",
    "e4_tfidf_topterms",
    # round-4 additions
    "e4_dup_ngram_frac",
    "x_scd2_history",
    "e4_segment_dedup",
    "e4_bigram_logprob",
    "e6_quality_gate",
    "e1_normalized_dedup",
    "e4_top_ngram_frac",
    # round-5 additions: the round-4 operators VERDICT r4 flagged as
    # bench-invisible — a regression in any of them now shows up in
    # BENCH_r{N}.json round-over-round
    "e2_semdedup",
    "e3_pq_topk",
    "e3_ivfpq_topk",
    "x_heavy_hitters",
    "x_heavy_hitters_exact",
    "x_table_profile",
    "e6_chunk_windows",
    "e6_temperature_mix",
    # round-5 additions
    "e3_hamming_topk",
    "e6_gopher_rules",
    "x_snapshot_diff",
    "e4_dsir_weights",
    "e3_embedding_covariance",
    "e3_pca_project",
    "e3_matryoshka_topk",
    "x_mad_outliers",
    "x_mode_per_group",
    "e2_containment_topk",
    "x_funnel_steps",
    "x_retention_cohorts",
    "e4_ccnet_buckets",
    "e2_similarity_histogram",
    "x_incremental_agg_maintenance",
    "e6_dataset_card",
    "e7_multimodal_pipeline",
    "e6_epoch_shuffle",
    "e2_minhash_calibration",
    "x_temporal_split",
    # round-6 additions (build op precedes the topk queries that serve
    # from its store; first-ever run pays the build once, cold)
    "e3_ann_index_build",
    "e4_substring_dedup",
    "e1_url_dedup",
    "e6_domain_filter",
    # round-6 shape rewrites: corpus-row windows replaced by the
    # distributed rank / histogram / partial-group-limit shapes
    "x_ntile_bucketing",
    "x_auc_quality",
    "x_locf_fill",
    "x_window_rank",
    # round-6 continuation: exact-integer analytics on ratio_round_big
    "x_group_regression",
    "e4_token_entropy",
    "x_event_gaps",
    "x_twap",
    "x_pagerank_exact",
    "x_gini",
    "j8_asof_low_card",
    "s8_kafka_sim_broker",
    "e2_pair_graph_triangles",
    "x_range_join_buckets",
    "e2_prefix_filter_pairs",
    "e4_pmi_collocations",
    "e2_pair_graph_kcore",
    # round-7 additions: lexical retrieval family
    "e8_inverted_index",
    "e8_bm25_topk",
    # round-7 continuation: layout + bitmap set algebra
    "x_bucketed_join",
    "x_bitmap_distinct",
    "x_bitmap_overlap",
    "e8_hybrid_rrf",
    "x_mvcc_time_travel",
    "x_manifest_pruning",
    "e4_linear_classifier",
    "x_schema_evolution",
    "x_sql_udtf_chunks",
    "x_feature_matrix",
    "x_dq_checks",
    "e6_contrastive_pairs",
    # round-7 continuation: mining / traversal / attribution family
    "x_frequent_pairs",
    "x_bfs_hops",
    "x_skyline",
    "e4_js_divergence",
    "x_sssp_bellman",
    "e2_sorted_neighborhood",
    # round-8 additions: real media decode chain + upgraded-oracle ANN
    "e5_bmp_decode_stats",
    "e5_wav_decode_stats",
    "e5_resize_thumbnails",
    "e3_quantized_topk",
    "e3_mmr_rerank",
    # round-9 additions: thresholded exact containment + admin DDL
    "e2_containment_filter_pairs",
    "k5_topic_admin",
    "e7_text_curation_pipeline",
    "e8_index_compaction",
    "e5_media_dir_ingest",
    # round-9 continuation: mergeable-sketch / lakehouse / classification batch
    "x_hll_union_estimate",
    "x_merge_into",
    "e4_keyword_extract",
    "e3_knn_classify",
    "x_kmv_intersection",
    "e8_prf_expansion",
    "x_ks_drift_test",
    "e5_audio_fingerprint",
    # round-11 additions: frozen-quantizer serve paths (new queries)
    "e3_ivf_kmeans_frozen_topk",
    "e3_pca_frozen_project",
]

# queries whose warm median lands under this get extra reps: sub-second
# timings are timer/scheduling dominated, and 3 samples gave up to ~26%
# min-max spread in BENCH_r02 — too noisy to catch a regression on a
# cheap query (VERDICT r2 item 8)
FAST_THRESHOLD_SEC = 0.5
FAST_TOTAL_REPS = 7

# queries whose warm spread (IQR/median) exceeds this get escalating
# extra reps: BENCH_r05 had two entries at 113%/217% spread — medians of
# 3 are not trustworthy there, and a regression in them is undetectable
# (VERDICT r5 #4). The dominant cause measured on this box is C2-JIT
# warm-in: a plan's first reps run interpreted/C1 and converge over
# ~5-8 executions, which round-robin stretches across the whole cycle.
HIGH_SPREAD_PCT = 50.0
HIGH_SPREAD_TOTAL_REPS = 11

# round 12 (VERDICT r11 #5): SLOW queries get extra reps too. The r11
# headline manufactured phantom risers (e2_pair_graph_triangles 4.62 s,
# x_bucketed_join 4.03 s) that the full sweep's >=3-rep-median rule
# refuted (flat at 2.62/2.77): when warm-in or a neighbor's GC inflates
# ALL THREE warm samples of an expensive plan, the IQR stays low and
# the spread escalation never fires — median-of-3 records the inflated
# plateau with high confidence. Entries over this threshold escalate to
# SLOW_TOTAL_REPS round-robin samples, and the steady-state trim below
# then drops the warm-in prefix before the median is taken.
SLOW_THRESHOLD_SEC = 2.0
SLOW_TOTAL_REPS = 6


def main() -> None:
    sf_path = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_path).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warm the JVM + parquet footers with one cheap query (not timed)
    queries["q6_forecast_revenue"](spark, sf_path).write.mode("overwrite").format("noop").save()
    # spawn the Python/Arrow worker pool before timing starts: the first
    # mapInPandas query otherwise pays ~3-4 s of one-time daemon forks +
    # numpy imports on its COLD sample (infrastructure, not query cost)
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

    # machine-speed calibration: a fixed CPU-bound job (hash 200M longs,
    # no I/O, no data dependence) whose wall time scales with this box's
    # effective core speed. Round-over-round query comparisons should be
    # read as (query_sec / calib_sec): round-5 measured the SAME code
    # 1.5-2x slower than round-4's recorded numbers on a slower host —
    # without a denominator that reads as a universal regression.
    from pyspark.sql import functions as _F

    def _calibrate() -> float:
        t0 = time.time()
        spark.range(200_000_000).select(
            _F.sum(_F.pmod(_F.xxhash64("id"), _F.lit(1_000_003)))
        ).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # round 9 (VERDICT r8 #6): two same-round calib measurements differed ±12%
    # when taken as one burst — larger than most cross-round deltas the
    # number is meant to normalize. Interleave >=6 samples ACROSS the
    # bench (before/after the cold pass + after every warm cycle), then
    # take the median and record the spread alongside, so the
    # denominator reflects the machine's speed DURING the measured
    # window, not one instant of it.
    _calibrate(), _calibrate()  # untimed: the calib job's OWN codegen/JIT
    # warm-in dominated its first samples (0.75 s vs a 0.21 s plateau)
    calib_samples = [_calibrate(), _calibrate()]

    cold = {name: round(run(name), 3) for name in HEADLINE}
    calib_samples.append(_calibrate())

    warm: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:  # round-robin: reps of one query never adjacent
            warm[name].append(run(name))
        calib_samples.append(_calibrate())

    def steady(ts: list[float]) -> list[float]:
        # steady-state window (round-8, VERDICT r7 #8): sub-second
        # queries decay monotonically over their first reps (codegen /
        # JIT warm-in — e7_multimodal_pipeline measured 1.17s -> 0.72s
        # across 9 reps), and those early samples sit permanently in
        # the upper quartile, so the escalation loop could never
        # converge the spread below the bar no matter how many reps it
        # added. Once enough samples exist, drop the first third and
        # measure the plateau — the regression-detection band is
        # steady-state noise, not warm-in slope. Round 12: the trim
        # engages from 6 samples (was 9) so the slow-query escalation
        # tier actually sheds its warm-in prefix.
        return ts[len(ts) // 3 :] if len(ts) >= 6 else ts

    def iqr_pct(ts: list[float]) -> float:
        # interquartile range over the median: robust to the one-off
        # GC/scheduling outlier that dominates a min-max spread once rep
        # counts rise; this is the regression-detection noise band
        ts = steady(ts)
        if len(ts) < 4:
            return round(100 * (max(ts) - min(ts)) / max(statistics.median(ts), 1e-9), 1)
        q = statistics.quantiles(ts, n=4)
        return round(100 * (q[2] - q[0]) / max(statistics.median(ts), 1e-9), 1)

    # fast queries get extra round-robin reps so their median stabilizes
    fast = [n for n in HEADLINE if statistics.median(warm[n]) < FAST_THRESHOLD_SEC]
    for _ in range(max(FAST_TOTAL_REPS - reps, 0)):
        for name in fast:
            warm[name].append(run(name))
        calib_samples.append(_calibrate())

    # slow queries escalate to SLOW_TOTAL_REPS samples (VERDICT r11 #5):
    # with >=6 samples the steady() trim drops the warm-in prefix, so
    # the recorded median sits on the converged plateau — the same rule
    # that made the full sweep's medians refute the r11 headline's
    # phantom risers, now applied to the artifact the driver reads
    slow = [n for n in HEADLINE if statistics.median(warm[n]) > SLOW_THRESHOLD_SEC]
    for _ in range(max(SLOW_TOTAL_REPS - reps, 0)):
        for name in slow:
            warm[name].append(run(name))
        calib_samples.append(_calibrate())

    # high-variance queries escalate further (VERDICT r5 #4): keep
    # adding round-robin reps while any query's spread exceeds
    # HIGH_SPREAD_PCT, up to HIGH_SPREAD_TOTAL_REPS samples — the
    # median then sits on the converged (post-JIT-warm-in) plateau
    noisy = [n for n in HEADLINE if iqr_pct(warm[n]) > HIGH_SPREAD_PCT]
    while noisy:
        for name in noisy:
            warm[name].append(run(name))
        noisy = [
            n for n in noisy
            if iqr_pct(warm[n]) > HIGH_SPREAD_PCT
            and len(warm[n]) < HIGH_SPREAD_TOTAL_REPS
        ]

    # median over the steady-state window of the (now ~10) interleaved
    # samples; IQR-based spread (same robustness rationale as query
    # spreads: one GC/scheduling outlier shouldn't dominate)
    calib_steady = steady(calib_samples)
    calib_sec = round(statistics.median(calib_steady), 3)
    cq = statistics.quantiles(calib_steady, n=4) if len(calib_steady) >= 4 else [
        min(calib_steady), statistics.median(calib_steady), max(calib_steady)
    ]
    calib_spread_pct = round(100 * (cq[2] - cq[0]) / calib_sec, 1)

    med = {n: round(statistics.median(steady(ts)), 3) for n, ts in warm.items()}

    spread_pct = {n: iqr_pct(ts) for n, ts in warm.items()}

    sf = sf_path.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full methodology record — kept OUT of the stdout line on purpose: the
    # driver captures only the last ~2000 bytes of output, and the r02/r03
    # lines (cold + spread + method inline) overflowed that window, so the
    # driver recorded parsed=null. Detail goes to a sidecar file instead.
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "sf": sf_val,
        "method": (
            f"median of {reps} warm reps (round-robin); queries under "
            f"{FAST_THRESHOLD_SEC}s get {FAST_TOTAL_REPS} reps; queries over "
            f"{SLOW_THRESHOLD_SEC}s get {SLOW_TOTAL_REPS} reps with the "
            "first-third warm-in prefix trimmed; spread = "
            f"IQR/median; spreads over {HIGH_SPREAD_PCT:.0f}% escalate to "
            f"up to {HIGH_SPREAD_TOTAL_REPS} reps (C2-JIT warm-in takes "
            "~5-8 executions of a plan). Floor: sub-0.3s timings remain "
            "timer-dominated (~50-100ms jitter)"
        ),
        "reps": reps,
        "fast_reps": FAST_TOTAL_REPS,
        "slow_reps": SLOW_TOTAL_REPS,
        "high_spread_reps": HIGH_SPREAD_TOTAL_REPS,
        "cold_total": round(sum(cold.values()), 3),
        "cold": cold,
        "spread_pct": spread_pct,
        "calib_sec": calib_sec,
        "calib_samples": [round(c, 3) for c in calib_samples],
        "calib_spread_pct": calib_spread_pct,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # stdout line budget: the driver captures only the LAST ~2000 bytes
    # of output, so the line must stay under that with margin. Per-query
    # values go out at 2 decimals; if the registry has grown past what
    # fits, the FASTEST queries (sub-0.3s medians are timer-jitter-
    # dominated anyway) fold into one "others_total"/"others_n" bucket
    # until the line fits — the full 3-decimal per-query record, cold
    # pass, spreads, and the method note always live in
    # BENCH_DETAIL.json alongside (committed, judge-readable).
    LINE_BUDGET = 1850

    def build_line(kept: dict[str, float], others: dict[str, float]) -> str:
        payload = {
            "metric": "headline_queries_total",
            "value": round(sum(med.values()), 3),
            "unit": "sec",
            "queries": {n: round(v, 2) for n, v in kept.items()},
            "sf": sf_val,
            "calib_sec": calib_sec,
        }
        if others:
            payload["others_total"] = round(sum(others.values()), 3)
            payload["others_n"] = len(others)
        return json.dumps(payload, separators=(",", ":"))

    by_time = sorted(med, key=med.get, reverse=True)  # slowest first
    n_kept = len(by_time)
    line = build_line(med, {})
    while len(line) >= LINE_BUDGET and n_kept > 1:
        n_kept -= 1
        kept = {n: med[n] for n in by_time[:n_kept]}
        others = {n: med[n] for n in by_time[n_kept:]}
        line = build_line(kept, others)
    assert len(line) < 1900, f"bench line {len(line)}B would overflow the driver's tail capture"
    print(line)


if __name__ == "__main__":
    main()
