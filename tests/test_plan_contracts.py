"""Physical-plan contracts for the headline queries — the 100 TB claims
each docstring makes, pinned as assertions over explain() output so a
regression (lost pushdown, surprise shuffle, broadcast flipping to
sort-merge, a sneaking cartesian product) fails CI instead of surfacing
as a mystery slowdown at scale.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges only (BroadcastExchange is a different node).
    In formatted mode each node appears once as a `(n) Exchange` detail
    header — count those, not the tree lines."""
    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def count_kernels(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) (?:MapInPandas|ArrowEvalPython)", plan, re.M))


def test_no_cartesian_products_anywhere(spark):
    """No registered headline query may plan a CartesianProduct — every
    intentional small-side cross join must be a broadcast variant."""
    for name in [
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "e3_cosine_topk",
        "e2_jaccard_topk",
        "e4_tfidf_topterms",
        "e4_unigram_logprob",
    ]:
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_scan_pushdown_survives(spark):
    """Column pruning must reach s1's scan (2 of region's 3 columns);
    q6's date/discount/quantity predicates must be pushed filters."""
    plan = plan_of(spark, "s1_scan_projection_pushdown")
    assert "ReadSchema: struct<r_regionkey:int,r_name:string>" in plan
    plan6 = plan_of(spark, "q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan6)
    assert m and "GreaterThanOrEqual" in m.group(1), "q6 filters not pushed"


def test_tpch_dimension_joins_broadcast(spark):
    """q3/q5 join dims (customer/nation/region) small-side: all joins
    must be broadcast, zero sort-merge."""
    for name in ["q3_shipping_priority", "q5_local_supplier_volume"]:
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_is_take_ordered(spark):
    """o1: top-k must plan as TakeOrderedAndProject (distributed partial
    top-k), never a global sort."""
    plan = plan_of(spark, "o1_topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_latest_per_key_is_aggregate_not_window(spark):
    """a2: latest-per-key must be a max_by aggregate (map-side partial
    collapse), not a row_number window over a shuffled sort."""
    plan = plan_of(spark, "a2_latest_per_key")
    assert "Window" not in plan
    assert "SortAggregate" in plan or "HashAggregate" in plan


def count_data_exchanges(plan: str) -> int:
    """Exchanges that move data by KEY (hash/range) — the shuffles that
    grow with corpus size. The explicitly-requested RoundRobin input
    spread (spread=True on the Arrow kernels: REPARTITION_BY_NUM over a
    single-file local scan) is excluded: a multi-split 100 TB scan
    never plans it, and it carries no key skew by construction."""
    total = count_exchanges(plan)
    spread = len(re.findall(r"Arguments: RoundRobinPartitioning\(\d+\), REPARTITION_BY_NUM", plan))
    return total - spread


def test_minhash_arrow_kernel_is_shuffle_free(spark):
    """e2_minhash_signatures: the Arrow kernel claims zero DATA shuffles
    — documents never move on a key; the only allowed exchange is the
    round-robin input spread for single-file local fixtures. Round 13
    (ADVICE r12): the query bypasses the _shared_sig memo and builds
    fresh on every invocation, so this contract always checks the REAL
    build plan — exactly one kernel, zero keyed exchanges, never a
    checkpoint scan standing in for the build."""
    plan = plan_of(spark, "e2_minhash_signatures")
    assert count_data_exchanges(plan) == 0, plan
    assert count_kernels(plan) == 1, plan
    assert "Scan ExistingRDD" not in plan, plan


def test_simhash_arrow_kernel_is_shuffle_free(spark):
    plan = plan_of(spark, "e2_simhash")
    assert count_data_exchanges(plan) == 0, plan


def test_lsh_pairs_single_signature_pass(spark):
    """e2_lsh_candidate_pairs (pin="checkpoint", the measured winner in
    the 12-rep interleaved A/B of tools/exp_lsh_pin.py — 1.37 s vs
    1.50 s persist / 1.53 s recompute at sf0.1 warm): the bucket-size
    cap must NOT re-execute the signature pipeline — the banded stream
    is checkpointed (one kernel evaluation upstream of the checkpoint),
    the cap is a groupBy + broadcast anti-join of over-cap bucket keys
    (partial agg collapses hot buckets map-side; no window buffering a
    hot bucket in one task), and no Python kernel appears downstream."""
    plan = plan_of(spark, "e2_lsh_candidate_pairs")
    assert count_kernels(plan) == 0, "kernel must live upstream of the checkpoint"
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan
    # bucket-size agg + bucket groupBy + final distinct
    assert count_data_exchanges(plan) <= 3, plan


def test_corpus_pipeline_three_shuffles(spark):
    """e7's docstring claims the whole dedup->gate->split pipeline is at
    most three shuffles; at the test SF the semi-join side broadcasts,
    leaving two (dedup agg + manifest agg)."""
    plan = plan_of(spark, "e7_corpus_pipeline")
    assert 2 <= count_exchanges(plan) <= 3, plan


def test_contamination_eval_side_broadcasts(spark):
    """e4_contamination_check: the eval set must broadcast — the
    training corpus is never shuffled for the join itself."""
    plan = plan_of(spark, "e4_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_int8_is_map_side_only(spark):
    plan = plan_of(spark, "e3_quantize_int8")
    assert count_exchanges(plan) == 0, plan
    assert "Join" not in plan


def test_winnowing_kernel_is_shuffle_free(spark):
    """The winnowing operator default is shuffle-free (documents never
    leave their input split — the 100 TB shape); the registered query
    opts into spread=True, which may add exactly the one round-robin
    exchange that unpins the single-row-group local file."""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import text as t

    df = t.winnowing_fingerprints_arrow(load(spark, SF, "documents"), "text", "doc_id")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert count_exchanges(plan) == 0, plan
    assert count_kernels(plan) == 1

    reg = plan_of(spark, "e4_winnowing_fingerprints")
    assert count_exchanges(reg) <= 1, reg
    assert count_kernels(reg) == 1


def test_sequence_packing_no_global_sort(spark):
    """e6_sequence_packing (round 6): the running token count comes
    from the distributed two-pass prefix sum — no Window over the shard
    key (which would run each shard's whole slice in one task), no
    single-partition global sort; the served plan reads the
    checkpointed range-partitioned layout through one cumsum kernel,
    and the only exchange is the (shard, bin) manifest aggregate."""
    plan = plan_of(spark, "e6_sequence_packing")
    import re as _re

    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1
    assert "shard" in plan
    for m in _re.finditer(r"Exchange (?:range|hash)partitioning\(([^)]*)", plan):
        assert "shard" in m.group(1), m.group(0)


def optimized_plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_no_broadcast_hint_on_corpus_scaling_sides(spark):
    """tfidf/unigram join a per-distinct-token aggregate of the WHOLE
    corpus (billions of rows at 100 TB): that side must carry NO
    broadcast hint — AQE broadcasts it at test SF and shuffle-joins at
    scale. The only permitted hint is on the 1-row corpus-count
    crossJoin. A second `strategy=broadcast` means someone re-hinted
    the vocabulary side (the round-2 tfidf scale bug)."""
    for name in ["e4_tfidf_topterms", "e4_unigram_logprob"]:
        plan = optimized_plan_of(spark, name)
        assert plan.count("strategy=broadcast") == 1, name
        for line in plan.splitlines():
            if "Join Inner, (tok" in line:
                assert "Hint" not in line, (name, line)


def test_jaccard_shuffles_hashed_keys_only(spark):
    """e2_jaccard_topk: the intersection self-join must key on the
    56-bit hash column, never the raw shingle string."""
    plan = plan_of(spark, "e2_jaccard_topk")
    assert "SortMergeJoin [sh" in plan or "ShuffledHashJoin [sh" in plan or (
        "sh#" in plan and "shingle#" not in plan
    ), plan[:2000]


def test_tfidf_single_corpus_scan(spark):
    """e4_tfidf_topterms: tf feeds both the docfreq aggregate and the
    scoring join — without the lazy localCheckpoint the corpus is
    scanned and exploded twice (exchange reuse misses the diamond
    because column pruning de-duplicates nothing). Pin: exactly one
    parquet scan of documents beyond the 1-row corpus count."""
    df = entry.queries()["e4_tfidf_topterms"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # n_docs count branch reads documents too; tf+docfreq+join must share ONE
    assert plan.count("Scan parquet") <= 2, plan[:3000]
    assert "Scan ExistingRDD" in plan or "ExistingRDD" in plan


def test_bigram_occurrences_form_map_side(spark):
    """e4_bigram_logprob: bigram occurrences come from the token array
    (arrays_zip of shifted slices + explode), never from a lag window
    over doc id; the occ/uni frames are localCheckpoint-ed so the
    downstream plan reads materialized RDDs (one corpus pass per frame
    instead of five — the measured 5x at sf0.1)."""
    plan = plan_of(spark, "e4_bigram_logprob")
    assert "Window" not in plan
    # vocab-sized unigram table is checkpointed (3 consumers); the
    # corpus-sized occurrence stream is NOT (recomputing the codegen
    # explode beats materializing 3 strings per token — 16x probe)
    assert plan.count("Scan ExistingRDD") >= 1
    assert plan.count("Generate") >= 2


def test_segment_dedup_skew_safe(spark):
    """e4_segment_dedup: distinct-doc frequency must come from two-level
    aggregation + a join back to the checkpointed segment stream —
    NEVER a window over the segment key (a hot boilerplate segment
    would buffer its whole partition in one task, and partial agg is
    the only thing that collapses it map-side)."""
    plan = plan_of(spark, "e4_segment_dedup")
    assert "Window" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed segs, no re-derive
    assert count_exchanges(plan) <= 4, plan[:2000]


def test_dup_ngram_skew_safe(spark):
    """e4_dup_ngram_frac: same contract — document frequency via
    groupBy + join-back on the checkpointed shingle stream, no window
    over the shingle key."""
    plan = plan_of(spark, "e4_dup_ngram_frac")
    assert "Window" not in plan
    assert "Scan ExistingRDD" in plan


def test_quality_gate_distributed_rank_no_window(spark):
    """e6_quality_gate (round 6): ranks come from the range-partitioned
    two-pass distributed rank, NOT a per-stratum Window — the served
    plan reads the checkpointed sorted layout through one rank kernel
    with no Window node and no stratum-keyed exchange (a window would
    put each language's whole corpus slice into one task)."""
    plan = plan_of(spark, "e6_quality_gate")
    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1
    assert count_exchanges(plan) == 0, plan[:2000]


def test_ccnet_buckets_distributed_rank_no_window(spark):
    """e4_ccnet_buckets (round 6): same contract — the per-language
    tertile rank must be the distributed rank, never a language window."""
    plan = plan_of(spark, "e4_ccnet_buckets")
    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1


def test_no_broadcast_hint_on_sf_scaling_tables(spark):
    """q2/q11 (and jaccard's per-document sizes) must not force-broadcast
    SF-scaling tables (supplier scales 10k rows per SF-unit; sizes is
    one row per document). Only constant dims (nation/region) and
    1-row aggregates may carry hints: count the hint nodes."""
    import re as _re

    for name, max_hints in [("q2_min_cost_supplier", 2), ("q11_important_stock", 2),
                            ("e2_jaccard_topk", 1)]:
        plan = optimized_plan_of(spark, name)
        hints = len(_re.findall(r"ResolvedHint", plan))
        assert hints <= max_hints, (name, hints, plan[:1500])


def test_hamming_topk_broadcasts_queries_no_cartesian(spark):
    """e3_hamming_topk: the probe side broadcasts (BroadcastNestedLoop
    on the != predicate is the intended bounded-side shape); the corpus
    never cartesian-joins; signature packing + XOR/popcount distances
    stay pure JVM expressions; the ONLY Python kernel is the
    partition_topk truncation fold (round-6 mergeable partial top-k)."""
    plan = plan_of(spark, "e3_hamming_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert count_kernels(plan) == 1


def test_brute_force_ann_family_has_no_window(spark):
    """VERDICT r5 #1: the brute-force ANN family must rank via the
    mergeable partial top-k (per-partition truncation + bounded merge),
    NEVER a Window/WindowGroupLimit over the corpus-sized scored set —
    the exchange after the scan must be flat in corpus size."""
    for name in ("e3_cosine_topk", "e3_hamming_topk", "e3_matryoshka_topk"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, (name, plan[:2000])
        assert "CartesianProduct" not in plan, name


def test_gopher_rules_is_map_side_only(spark):
    """e6_gopher_rules: one scan, zero shuffles, zero Python kernels —
    a pure projection battery."""
    plan = plan_of(spark, "e6_gopher_rules")
    assert count_exchanges(plan) == 0
    assert count_kernels(plan) == 0


def test_snapshot_diff_is_one_full_outer_sortmerge(spark):
    """x_snapshot_diff: both snapshots are corpus-sized — the diff must
    be ONE co-partitioned sort-merge full outer join, never a broadcast
    of either side."""
    plan = plan_of(spark, "x_snapshot_diff")
    assert "SortMergeJoin FullOuter" in plan
    assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert count_exchanges(plan) == 2  # one per side of the join


def test_dsir_scoring_join_broadcasts_bucket_table(spark):
    """e4_dsir_weights: the B-row bucket table must broadcast into the
    corpus-sized occurrence stream (constant-size side — NOT the tfidf
    vocabulary mistake), and nothing plans a cartesian product."""
    plan = plan_of(spark, "e4_dsir_weights")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_covariance_single_shuffle_constant_width(spark):
    """e3_embedding_covariance: per-batch matmul partials then ONE
    exchange over (partitions * dim^2/2) rows — corpus-size-independent
    shuffle."""
    plan = plan_of(spark, "e3_embedding_covariance")
    assert count_exchanges(plan) == 1
    assert count_kernels(plan) == 1


def test_matryoshka_shortlist_prunes_before_rerank(spark):
    """e3_matryoshka_topk: stage 1 ranks via the mergeable partial
    top-k (exactly one truncation kernel — the shortlist's vectors are
    fetched by a broadcast join afterwards, so vectors never cross
    Arrow), stage 2 is shortlist-sized, and the query side broadcasts —
    never a cartesian, never a Window."""
    plan = plan_of(spark, "e3_matryoshka_topk")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert count_kernels(plan) == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mode_per_group_partial_aggregates(spark):
    """x_mode_per_group: the composite-key count partial-aggregates
    map-side (hot event types combine before the shuffle) and the rank
    prunes via WindowGroupLimit."""
    plan = plan_of(spark, "x_mode_per_group")
    assert "partial_count" in plan
    assert "WindowGroupLimit" in plan


def test_mad_outliers_windows_on_histograms_only(spark):
    """x_mad_outliers (round 6): the median/MAD selections run over
    per-(source, value) HISTOGRAMS — every remaining window partitions
    by source but its input is the partial-aggregated histogram
    (distinct values per source), never corpus rows; join-backs carry
    no forced broadcast hint (AQE decides — the tfidf lesson)."""
    plan = plan_of(spark, "x_mad_outliers")
    assert "CartesianProduct" not in plan
    parts = re.findall(r"windowspecdefinition\(([^,)]+)", plan)
    assert parts and all("source" in p for p in parts), parts
    assert "partial_count" in plan  # the histogram partial aggregate


def test_funnel_cascade_stays_on_user_key(spark):
    """x_funnel_steps: every aggregate and join keys on user_id — after
    the first exchange the cascade is co-partitioned; no window, no
    cartesian."""
    plan = plan_of(spark, "x_funnel_steps")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial_min" in plan  # conditional mins partial-aggregate


def test_containment_reuses_jaccard_skeleton(spark):
    """e2_containment_topk: hashed 8-byte join keys, DF-capped via
    broadcast anti-join (never a window over the shingle key), top-k
    via TakeOrderedAndProject."""
    plan = plan_of(spark, "e2_containment_topk")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"windowspecdefinition\(sh", plan)


def test_multimodal_pipeline_plan_hygiene(spark):
    """e7_multimodal_pipeline: no cartesian product, no Python kernel
    (the embedding checksum is a codegen fold), and the manifest agg
    partial-aggregates on the 8-value shard key."""
    plan = plan_of(spark, "e7_multimodal_pipeline")
    assert "CartesianProduct" not in plan
    assert count_kernels(plan) == 0
    assert "partial_count" in plan or "partial_sum" in plan


def test_substring_dedup_no_window_one_kernel(spark):
    """e4_substring_dedup: window hashing is ONE Arrow kernel; the
    corpus frequency is a partial-aggregable groupBy (no Window over
    the hash key — hot boilerplate collapses map-side); span merge is
    per-doc array math (no Window over doc either)."""
    plan = plan_of(spark, "e4_substring_dedup")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # the Arrow window-hash kernel runs once, UPSTREAM of the lazy
    # checkpoint (the LSH rule): the served plan reads the checkpointed
    # stream and re-evaluates no Python
    assert count_kernels(plan) == 0, plan[:1500]
    assert "Scan ExistingRDD" in plan
    assert "partial_count" in plan  # map-side combine on the frequency agg


def test_url_dedup_is_pure_codegen_single_exchange(spark):
    """e1_url_dedup: canonicalization must stay whole-stage-codegen
    expressions (no Python kernel, no UDF) and the dedup is one
    exchange on the canonical key."""
    plan = plan_of(spark, "e1_url_dedup")
    assert count_kernels(plan) == 0
    assert "BatchEvalPython" not in plan
    # two exchanges: countDistinct(raw) plans the standard two-phase
    # distinct aggregate (partial on (canon, raw), final on canon) —
    # both keyed on the canonical URL, both partial-aggregable
    assert count_exchanges(plan) == 2
    assert "Window" not in plan


def test_domain_cap_no_window_on_domain_key(spark):
    """e6_domain_cap: the keep set must come from the mergeable partial
    top-k (one truncation kernel), never a Window over the domain key —
    the hot-domain analog of the hot-LSH-bucket rule."""
    plan = plan_of(spark, "e6_domain_cap")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert count_kernels(plan) == 1


def test_rank_filter_queries_prune_via_partial_group_limit(spark):
    """x_window_rank / e6_per_source_sample: the rnk-filter windows must
    keep their inferred WindowGroupLimit in PARTIAL mode below the
    exchange — each map partition truncates to its top-k per group
    BEFORE the shuffle, so the group-key exchange carries
    <= n_partitions * n_groups * k rows, flat in corpus size. Losing
    the Partial node (e.g. by ranking before the filter is inferable)
    silently reverts these to corpus-sized exchanges into |group| tasks."""
    for name in ("x_window_rank", "e6_per_source_sample"):
        df = entry.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ", Partial" in plan and ", Final" in plan, (name, plan[:2000])
        # the Partial group-limit must sit below (after, in tree text)
        # the shuffle exchange
        assert plan.index(", Partial") > plan.index("Exchange hashpartitioning"), name


def test_ntile_distributed_rank_no_window(spark):
    """x_ntile_bucketing (round 6): decile membership is integer
    arithmetic over the distributed two-pass rank — no ntile Window
    (which would sort each event_type's whole corpus slice in one
    task), one rank kernel reading the checkpointed sorted layout."""
    plan = plan_of(spark, "x_ntile_bucketing")
    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1


def test_auc_windows_on_histogram_only(spark):
    """x_auc_quality: the corpus must collapse through a
    partial-aggregable groupBy into the bounded quality-value histogram
    (<= ~10k rows by value domain) BEFORE any per-row cumulation.
    Round 9: the histogram cumulation moved from the last unpartitioned
    Window onto rank.stratified_cumsum (constant stratum), so the plan
    now carries ZERO windowspecdefinitions — the registry-wide lint
    (test_plan_lint) would reject the old form."""
    plan = plan_of(spark, "x_auc_quality")
    # the served plan reads ONLY the checkpointed sorted histogram
    # layout (stratified_cumsum's pass-2 kernel input) — no corpus
    # parquet scan and no Window survive; the corpus-collapsing
    # partial agg ran upstream of the checkpoint
    assert "Scan ExistingRDD" in plan, plan[:2000]
    assert "Scan parquet" not in plan, plan[:2000]
    assert len(re.findall(r"windowspecdefinition\(", plan)) == 0, plan[:2000]


def test_asof_low_card_distributed_carry_no_window(spark):
    """j8_asof_low_card (round 6): the per-key running struct carry is
    the two-pass distributed form — no Window over the event_type key,
    one fill kernel over the checkpointed union layout."""
    plan = plan_of(spark, "j8_asof_low_card")
    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1


def test_pagerank_exact_iteration_shape(spark):
    """x_pagerank_exact (round 6): the contribution-ready edge list is
    checkpointed once and every power iteration is a join + aggregate
    over it — no cartesian, no Window, top-20 via
    TakeOrderedAndProject (never a global rank sort)."""
    plan = plan_of(spark, "x_pagerank_exact")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Scan ExistingRDD" in plan


def test_nulls_ordering_global_rank_no_window(spark):
    """x_nulls_ordering (round 6): both global rankings ride the
    distributed rank (two kernels) — no rank Window, no
    single-partition global sort (every rangepartitioning keeps its
    requested partition count)."""
    plan = plan_of(spark, "x_nulls_ordering")
    assert "Window" not in plan, plan[:2000]
    assert count_kernels(plan) == 2
    assert "Scan ExistingRDD" in plan


def test_epoch_shuffle_distributed_rank_no_window(spark):
    """e6_epoch_shuffle (round 6): within-shard positions come from the
    distributed two-pass rank — no row_number Window per (epoch, shard)
    (fixed shard count -> corpus/shards rows sorted in one task), one
    rank kernel over the checkpointed layout."""
    plan = plan_of(spark, "e6_epoch_shuffle")
    assert "Window" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan
    assert count_kernels(plan) == 1


def test_group_regression_is_mergeable_moments(spark):
    """x_group_regression: one partial-aggregable groupBy producing the
    five integer moment sums — a single exchange on the group key, no
    Window, no join; the normal-equation algebra is pure projection."""
    plan = plan_of(spark, "x_group_regression")
    assert "Window" not in plan
    assert "Join" not in plan
    assert count_exchanges(plan) == 1, plan[:2000]
    assert "partial_sum" in plan and "partial_count" in plan


def test_token_entropy_collapses_through_vocab(spark):
    """e4_token_entropy: the corpus must collapse map-side through the
    (source, tok) vocabulary partial aggregate before anything joins or
    re-aggregates; the per-source totals join into the VOCAB-sized
    stream, never the corpus stream, and no Window appears."""
    plan = plan_of(spark, "e4_token_entropy")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert count_kernels(plan) == 0  # pure JVM expressions throughout


def test_event_gaps_distributed_lead_no_window(spark):
    """x_event_gaps / x_twap (round 6): successor timestamps come from
    the distributed two-pass lead — no Window over the event_type key,
    one lead kernel over the checkpointed sorted layout, and the final
    aggregate partial-aggregates on the type key."""
    for name in ("x_event_gaps", "x_twap"):
        plan = plan_of(spark, name)
        assert "Window" not in plan, (name, plan[:2000])
        assert "Scan ExistingRDD" in plan, name
        assert count_kernels(plan) == 1, name
        assert "partial_sum" in plan or "partial_count" in plan, name


def test_ann_query_paths_scan_stored_codes(spark):
    """e3_ivfpq_topk must consume the persisted index: its plan scans
    the parquet codes store (cell IN (...) pushed to that scan), not a
    freshly-encoded corpus; the raw embeddings are read only for the
    shortlist vector fetch and the query side."""
    import re as _re

    plan = plan_of(spark, "e3_ivfpq_topk")
    assert "ann_index" in plan, "query does not read the persisted codes store"
    m = _re.search(r"PushedFilters: \[[^\]]*In\(cell", plan)
    assert m, "probe cell filter not pushed to the codes scan"


def test_range_join_is_hash_join_not_nested_loop(spark):
    """x_range_join_buckets exists to avoid the BroadcastNestedLoopJoin
    a raw inequality join would plan: the month bucketization must turn
    it into a hash join (equi-key m0) carrying the BETWEEN residual,
    and the interval side must never be nested-loop-scanned."""
    plan = plan_of(spark, "x_range_join_buckets")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin)", plan)


def test_bucketed_join_is_exchange_free(spark):
    """x_bucketed_join's 100 TB claim: both sides written bucketed on
    the join key -> the SortMergeJoin consumes bucket-aligned scans
    with ZERO shuffle exchanges; the identical join over plain parquet
    needs one exchange per side. (The registered query's executed plan
    is checked directly here because its tables are session-scoped.)"""
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.plans.joins_aggs import (
        bucketed_tables,
    )

    li, o, cleanup = bucketed_tables(spark, SF)
    try:
        j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        cleanup()

    li_p = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o_p = load(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    plain = li_p.hint("merge").join(o_p, li_p.l_orderkey == o_p.o_orderkey)
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert plain_plan.count("Exchange") >= 2, plain_plan


def test_bitmap_distinct_is_partial_aggregable_no_expand(spark):
    """x_bitmap_distinct's claim: the bitmap form never plans Spark's
    two-stage distinct (no Expand node, no shuffle of the raw
    (group, id) pairs) — just two partial-aggregable HashAggregates;
    and every expression stays in whole-stage codegen (no Python)."""
    plan = plan_of(spark, "x_bitmap_distinct")
    assert "Expand" not in plan
    assert count_kernels(plan) == 0
    assert "BatchEvalPython" not in plan
    # one exchange per groupBy level: (group, w_idx) then (group)
    assert count_exchanges(plan) == 2, plan


def test_bitmap_overlap_joins_words_not_ids(spark):
    """x_bitmap_overlap must self-join the word frame (key: w_idx),
    never the raw id multiset, and the per-group distinct sides ride
    broadcasts."""
    plan = plan_of(spark, "x_bitmap_overlap")
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan
    assert count_kernels(plan) == 0


def test_bloom_semi_join_sandwich_prunes_before_exact_join(spark):
    """x_bloom_semi_join (round 8): the broadcast-bitmap pre-filter
    must actually prune — survivors sit strictly BETWEEN the exact
    semi-join result (no false negatives: every true match survives)
    and the raw fact scan (real pruning: most non-matching rows drop
    map-side, before any shuffle). A broken probe that passes
    everything or drops a true match breaks an inequality; the
    registered query's oracle separately pins exact equality of the
    final result."""
    from pyspark.sql import functions as F

    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import membership

    sf = "/root/testdata/sf0.01"
    cust = (
        load(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    orders = load(spark, sf, "orders").select("o_custkey")
    bitmap = membership.bloom_build(
        cust.select(F.xxhash64("c_custkey").alias("k")), "k", m_bits=1 << 18
    )
    pre = membership.bloom_probe(
        orders.withColumn("k", F.xxhash64("o_custkey")), "k", bitmap,
        m_bits=1 << 18,
    ).filter(F.col("bloom_member"))
    n_scan = orders.count()
    n_pre = pre.count()
    n_exact = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    ).count()
    assert n_exact <= n_pre < n_scan, (n_exact, n_pre, n_scan)
    # the FP sliver the exact join removes should be small at this m/k
    assert n_pre - n_exact < 0.05 * n_scan, (n_pre, n_exact, n_scan)
