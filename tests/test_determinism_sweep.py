"""Partition-count determinism sweep: the oracle gate re-run with a
different (adversarial, non-power-of-two) shuffle partitioning for the
queries most at risk of partition-order sensitivity — float
aggregations, window ties, sketches, kernels. A query whose result
depends on how rows are partitioned would hash-mismatch here while
passing the default gate (the full registry sweep at 7 partitions /
5 cores was last run green round-6: 180 ok / 37 rows-only / 0 fail;
this keeps the riskiest subset pinned on every pytest run)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

RISKY = {
    "q1_pricing_summary",      # float sums
    "q9_profit_by_nation_year",
    "x_percentiles",           # exact percentile over partitioned multiset
    "x_stats_moments",         # variance/skew accumulation order
    "e4_unigram_logprob",      # integer micro-nat determinism claim
    "e4_bigram_logprob",
    "e2_minhash_signatures",   # Arrow kernel batch boundaries
    "e2_lsh_candidate_pairs",  # bucket cap + pair expansion
    "e4_winnowing_fingerprints",
    "e4_segment_dedup",        # join-back frequency counts
    "e4_dup_ngram_frac",
    "e6_source_mix",           # salted-hash fractional copies
    "e6_sequence_packing",     # sharded prefix sums
    "e7_corpus_pipeline",
    "x_window_frames",         # window tie ordering
    "x_zorder_layout",
    "e6_quality_gate",         # percent_rank ties
    "e4_top_ngram_frac",       # Arrow kernel batch boundaries
    "e4_semantic_decontam",    # rounded cosine max over partitioned groups
    "e6_temperature_mix",      # float normalizer summed across sources
    "e6_chunk_windows",        # explode + hash, should be order-free
    "x_winsorized_stats",      # rank-window ties + clamp join
    "x_table_profile",         # multi-distinct Expand
    "x_attribution",           # max_by struct pick across partition layouts
    "x_skyline",               # distributed cummin/lead carries
    "e2_sorted_neighborhood",  # distributed rank + bucket band join
    "x_rfm_segments",          # three stratified_rank passes
    "x_heavy_hitters_exact",   # top-k ties
    "e4_dsir_weights",         # micro-nat log-ratios over bucket counts
    "e3_embedding_covariance", # exact-int partial matmuls across batches
    "e3_hamming_topk",         # integer-distance window ties
    "e3_matryoshka_topk",      # two-stage rounded-sim window ties
    "x_mad_outliers",          # integer-rank median/MAD selections
    "x_mode_per_group",        # count ties broken by value
    "e2_containment_topk",     # DF cap + rank ties over integer ratios
    "x_retention_cohorts",     # distinct + week arithmetic
    "e4_ccnet_buckets",        # per-language rank thirds over LM scores
    "e6_dataset_card",         # multi-distinct Expand + top-lang rank ties
    "x_incremental_agg_maintenance",  # merge-vs-recompute identity
    "e6_epoch_shuffle",        # permutation checksum over distributed-rank order
    "e2_minhash_calibration",  # integer error units over pair joins
    # round 6
    "e4_substring_dedup",      # Arrow window kernel batch boundaries + partial topk-free span math
    "e4_substring_removal",    # cleaned-text md5 over per-doc kept joins
    "e1_url_dedup",            # countDistinct two-phase over canonical key
    "e6_domain_cap",           # mergeable partial top-k keep set across partitions
    "x_locf_fill",             # cross-partition carry seeds in stratified_locf
    "x_ntile_bucketing",       # distributed-rank offsets + integer ntile math
    "x_auc_quality",           # histogram midranks over partial-agg counts
    "x_group_regression",      # decimal normal-equation sums across partitions
    "e4_token_entropy",        # micro-nat surprisals + decimal sum-of-products
    "x_event_gaps",            # cross-partition lead seeds + batch boundaries
    "x_twap",                  # lead seeds + decimal weighted sums
    # round 8 — quantized ANN full oracles: rounded assignment keys,
    # Arrow-batch truncation boundaries, partial-topk merge order
    "e3_pq_topk",
    "e3_ivfpq_topk",
    "e3_quantized_topk",
    "x_nulls_ordering",        # global distributed rank + sentinel keys
    "x_pagerank_exact",        # integer power iterations across partitions
    "x_gini",                  # distributed-rank products over partitions
    "j8_asof_low_card",        # cross-partition struct carry seeds
    "e2_prefix_filter_pairs",  # per-doc rank prefixes + DF-cap joins across partitions
    "e2_containment_filter_pairs",  # min-side prefixes + positional min_by ties
    "e7_text_curation_pipeline",  # chained semi-joins + LSH CC + percent_rank halves
    "e4_pmi_collocations",     # micro-nat ln over joined count tables + top-k ties
    "e2_pair_graph_kcore",     # iterative semi-join peel fixpoint across partitions
    # round 7
    "e8_inverted_index",       # mergeable partial top-k postings across partitions
    "e8_hybrid_rrf",           # two partial top-k pools + integer fuse re-rank
    "e6_contrastive_pairs",    # LSH chain + hash-thinned negative pool
    "e8_bm25_topk",            # decimal-summed contributions + partial top-k
    # round 9 — analytics2 batch
    "x_hll_union_estimate",    # register max-merge + integer harmonic sum across partitions
    "e4_keyword_extract",      # broadcast marginals + per-source score/tok rank ties
    "x_autocorr_lags",         # decimal moment expansion over lag equi-joins
    "x_chisq_independence",    # per-cell integer micro rounding then order-free sum
    "e3_knn_classify",         # partial top-k boundary ties + vote-rank ties
    "x_kmv_intersection",      # bottom-k boundary + theta-min joins across partitions
    "e8_prf_expansion",        # two-pass decimal scoring + feedback-term rank ties
    "x_ks_drift_test",         # stratified_cumsum carries + decimal sup fold
    "e4_bpe_merges",           # iterative vocab argmax across partitions
    "e4_bpe_token_counts",     # learned-merge application + \x01 checksum
    "e5_audio_fingerprint",    # Arrow decode batches + bounded hamming rank
    # round 10 — greedy-capstone + splitmix full oracles
    "e2_semdedup",             # frozen-centroid int argmin + per-cell greedy scan
    "e8_rag_context_pack",     # RRF grid lift + MMR unroll + budget window
    "e4_contamination_bloom",  # splitmix64 positions folded across partitions
    "x_stream_session_window", # gaps-and-islands vs session-state merge
    "x_stream_sliding_topk",   # decimal window sums + serve-rank ties
    "x_fuzzy_name_match",      # probe repartition + banded-DP pair aggregation
    # round 11 — frozen-quantizer serve + composed recall oracle
    "e3_ivf_kmeans_frozen_topk",  # rounded-sim arg_max assignment + serve-rank ties
    "e3_ann_recall_report",    # 7 rounded-sim method replays + membership join
    "e3_pca_frozen_project",   # int64 floor-divide projection across batches
}


def test_oracle_gate_under_seven_partitions(spark):
    from parity import run_parity

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        n_pass, n_ro, failures = run_parity(
            spark, "/root/testdata/sf0.01", only=RISKY, verbose=False
        )
        assert not failures, failures
        assert n_pass == len(RISKY)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
