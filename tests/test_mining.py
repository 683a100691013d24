"""Pattern-mining / BFS / attribution extensions (plans/mining.py).

All three are fully oracle-verified; these tests pin the semantic edges
a hash match alone could get right by accident on the synthetic fixture:
the attribution lookback bound and millisecond tie-break, BFS min-hop
assignment and unreachability, and the A-Priori support prune plus the
integer association arithmetic.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from public_transit_status_with_apache_kafka_spark.plans.mining import QUERIES


def _write(df, tmp, name):
    df.write.parquet(os.path.join(tmp, f"{name}.parquet"))


def _events_df(spark, rows):
    # rows: (event_id, minutes_offset, user_id, event_type)
    base = dt.datetime(2024, 3, 10, 12, 0, 0)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=m), u, t, 0.0, "{}")
            for i, m, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_attribution_lookback_null_and_tiebreak(spark):
    day = 24 * 60
    rows = [
        # user 1: click 10 min before purchase -> attributed, gap 600000 ms
        (10, 0, 1, "click"),
        (11, 10, 1, "purchase"),
        # user 2: only click is OLDER than 24 h -> NULL attribution
        (20, 0, 2, "click"),
        (21, day + 1, 2, "purchase"),
        # user 3: two clicks at the SAME ms -> higher click_id wins
        (30, 0, 3, "click"),
        (31, 0, 3, "click"),
        (32, 5, 3, "purchase"),
        # user 4: click exactly AT the purchase ts counts (<=)
        (40, 7, 4, "click"),
        (41, 7, 4, "purchase"),
        # user 5: purchase with no clicks at all -> NULL
        (51, 3, 5, "purchase"),
    ]
    tmp = tempfile.mkdtemp(prefix="attr_")
    try:
        _write(_events_df(spark, rows), tmp, "events")
        out = {r.purchase_id: r for r in QUERIES["x_attribution"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[11].click_id == 10 and out[11].gap_ms == 600_000
    assert out[21].click_id is None and out[21].gap_ms is None
    assert out[32].click_id == 31  # same-ms tie -> max click_id
    assert out[41].click_id == 40 and out[41].gap_ms == 0
    assert out[51].click_id is None
    assert len(out) == 5  # exactly one row per purchase


def _orders_lineitem(spark, edges):
    # edges: (custkey, suppkey) transactions; one synthetic order per edge
    orders = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(edges)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(edges)],
        "l_orderkey long, l_suppkey long",
    )
    return orders, lineitem


def test_bfs_min_hop_and_unreachable(spark):
    # seed custs are <= 10. Graph (S = supplier node = suppkey + 1e6):
    #   cust 1 - S7 - cust 20 - S8        (hops 0,1,2,3)
    #   cust 30 - S9                       (disconnected -> absent)
    edges = [(1, 7), (20, 7), (20, 8), (30, 9)]
    o, li = _orders_lineitem(spark, edges)
    tmp = tempfile.mkdtemp(prefix="bfs_")
    try:
        _write(o, tmp, "orders")
        _write(li, tmp, "lineitem")
        out = {r.hop: r for r in QUERIES["x_bfs_hops"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[0].n_nodes == 1 and out[0].node_checksum == 1
    assert out[1].n_nodes == 1 and out[1].node_checksum == 1_000_007
    assert out[2].n_nodes == 1 and out[2].node_checksum == 20
    assert out[3].n_nodes == 1 and out[3].node_checksum == 1_000_008
    # disconnected component never appears at any hop
    total = sum(r.n_nodes for r in out.values())
    assert total == 4


def test_frequent_pairs_prune_and_integer_stats(spark):
    # 4 baskets over brands A,B,C,R:
    #   c1: A B   c2: A B   c3: A B C   c4: A C
    # minsup = 4 div 4 = 1 basket -> every singleton frequent; pair
    # counts: AB=3, AC=2, BC=1.
    basket = {1: "AB", 2: "AB", 3: "ABC", 4: "AC"}
    edges = []
    for c, brands in basket.items():
        for b in brands:
            edges.append((c, ord(b)))
    orders = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(edges)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(i, p) for i, (_, p) in enumerate(edges)], "l_orderkey long, l_partkey long"
    )
    part = spark.createDataFrame(
        [(ord(b), f"Brand#{b}") for b in "ABCR"], "p_partkey long, p_brand string"
    )
    tmp = tempfile.mkdtemp(prefix="fp_")
    try:
        _write(orders, tmp, "orders")
        _write(lineitem, tmp, "lineitem")
        _write(part, tmp, "part")
        out = {
            (r.brand_a, r.brand_b): r
            for r in QUERIES["x_frequent_pairs"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ab = out[("Brand#A", "Brand#B")]
    # support 3 of 4; n_a=4 (A in all), n_b=3 -> conf A->B = 750000,
    # conf B->A = 1000000, lift = 1e6*3*4 / (4*3) = 1000000
    assert ab.n_pair == 3 and ab.n_a == 4 and ab.n_b == 3
    assert ab.conf_ab_micro == 750_000
    assert ab.conf_ba_micro == 1_000_000
    assert ab.lift_micro == 1_000_000
    ac = out[("Brand#A", "Brand#C")]
    assert ac.n_pair == 2 and ac.lift_micro == 1_000_000
    bc = out[("Brand#B", "Brand#C")]
    # lift = 1e6*1*4/(3*2) = 666666 (floor)
    assert bc.n_pair == 1 and bc.lift_micro == 666_666
    # brand R never bought -> pruned by the singleton pass, in no pair
    assert not any("R" in a or "R" in b for a, b in out)


def test_skyline_dominance_and_ties(spark):
    # points (qty, rev_cents): parts 1+2 (10, 350) tie and beat the
    # frontier min above them (400) -> BOTH survive; part 3 (10, 600)
    # dominated within its qty level; part 4 (12, 700) survives (highest
    # qty); part 5 (11, 400) survives (beats 700); part 6 (9, 450)
    # dominated by parts 1/2 (10 > 9, 350 < 450); part 7 (8, 300)
    # survives.
    pts = {1: (10, 3.50), 2: (10, 3.50), 3: (10, 6.00),
           4: (12, 7.00), 5: (11, 4.00), 6: (9, 4.50), 7: (8, 3.00)}
    lineitem = spark.createDataFrame(
        [(pid, float(q), p) for pid, (q, p) in pts.items()],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    tmp = tempfile.mkdtemp(prefix="sky_")
    try:
        _write(lineitem, tmp, "lineitem")
        out = sorted(
            (r.part_id, r.qty, r.rev_cents)
            for r in QUERIES["x_skyline"](spark, tmp).collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out == [
        (1, 10, 350),
        (2, 10, 350),
        (4, 12, 700),
        (5, 11, 400),
        (7, 8, 300),
    ]


def test_js_divergence_identical_and_disjoint_sources(spark):
    # s0 == s1 token-for-token -> JS = 0; s2 shares nothing with either
    # -> JS = ln(2) in micro-nats (two half-up halves of 693147/2).
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma", "en", "s0", 0),
            (2, "alpha beta beta gamma", "en", "s1", 0),
            (3, "delta epsilon delta zeta", "en", "s2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="js_")
    try:
        _write(docs, tmp, "documents")
        out = {
            (r.source_a, r.source_b): r
            for r in QUERIES["e4_js_divergence"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[("s0", "s1")].js_micro_nats == 0
    assert out[("s0", "s1")].n_common == 3
    ln2_total = 346_574 * 2  # half-up of 693147/2, both halves
    assert out[("s0", "s2")].js_micro_nats == ln2_total
    assert out[("s0", "s2")].n_common == 0
    assert out[("s1", "s2")].js_micro_nats == ln2_total


def test_label_centroids_orthogonal_and_parallel(spark):
    def vec(i, scale):
        v = [0.0] * 64
        v[i] = float(scale)
        return v

    emb = spark.createDataFrame(
        [
            (1, vec(0, 1), 0),
            (2, vec(0, 1), 0),
            (3, vec(1, 1), 1),
            (4, vec(0, 2), 2),  # parallel to label 0, larger norm
        ],
        "vec_id long, embedding array<float>, label int",
    )
    tmp = tempfile.mkdtemp(prefix="cent_")
    try:
        _write(emb, tmp, "embeddings")
        out = {
            (r.label_a, r.label_b): r
            for r in QUERIES["e3_label_centroids"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[(0, 1)].cos_r6 == 0.0
    assert out[(0, 2)].cos_r6 == 1.0  # cosine is norm-invariant
    assert out[(1, 2)].cos_r6 == 0.0
    assert out[(0, 1)].n_a == 2 and out[(0, 1)].n_b == 1


def test_sssp_weights_and_hop_bound(spark):
    # chain 1 -S7- 20 -S8- 30 -S9 (supplier nodes are suppkey + 1e6).
    # edge (1,S7) is backed by TWO orders -> w = 500000; all others one
    # order -> w = 1000000. S9 is 5 edges from the seed -> absent under
    # the 4-round bound.
    edges = [(1, 7), (1, 7), (20, 7), (20, 8), (30, 8), (30, 9)]
    o, li = _orders_lineitem(spark, edges)
    tmp = tempfile.mkdtemp(prefix="sssp_")
    try:
        _write(o, tmp, "orders")
        _write(li, tmp, "lineitem")
        out = {r.node: r.dist_micro for r in QUERIES["x_sssp_bellman"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[1] == 0
    assert out[1_000_007] == 500_000
    assert out[20] == 1_500_000
    assert out[1_000_008] == 2_500_000
    assert out[30] == 3_500_000
    assert 1_000_009 not in out  # 5th edge: beyond the round bound


def test_sorted_neighborhood_window_semantics(spark):
    # 6 docs; sort key = cleaned 24-char prefix. d1/d2 share a prefix
    # and are adjacent in sort order -> compared, high jaccard. d5/d6
    # are identical but their sort keys land them > w positions apart
    # (separated by d3, d4, and the d1/d2 block) -> NOT compared: the
    # documented SNM blocking-recall trade (single-pass, one key).
    docs = spark.createDataFrame(
        [
            (1, "aaa common tokens here one", "en", "s0", 0),
            (2, "aaa common tokens here one", "en", "s0", 0),
            (3, "bbb filler alpha", "en", "s0", 0),
            (4, "ccc filler beta", "en", "s0", 0),
            (5, "ddd twin text payload", "en", "s0", 0),
            (6, "zzz but same tokens?", "en", "s0", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="snm_")
    try:
        _write(docs, tmp, "documents")
        out = {
            (r.doc_a, r.doc_b): r.jaccard_micro
            for r in QUERIES["e2_sorted_neighborhood"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[(1, 2)] == 1_000_000  # identical adjacent docs
    # every reported pair is within the rank window and above tau
    assert all(v >= 300_000 for v in out.values())


def test_markov_transitions_probabilities_sum(spark):
    # user 1: view -> click -> view -> click ; user 2: view -> error
    rows = [
        (1, 0, 1, "view"), (2, 1, 1, "click"), (3, 2, 1, "view"),
        (4, 3, 1, "click"), (5, 0, 2, "view"), (6, 1, 2, "error"),
    ]
    tmp = tempfile.mkdtemp(prefix="mkv_")
    try:
        _write(_events_df(spark, rows), tmp, "events")
        out = {
            (r.from_type, r.to_type): r
            for r in QUERIES["x_markov_transitions"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # from 'view': 2x ->click, 1x ->error (n_from 3)
    assert out[("view", "click")].n == 2
    assert out[("view", "click")].p_micro == 666_666
    assert out[("view", "error")].p_micro == 333_333
    # from 'click': exactly one transition, back to view
    assert out[("click", "view")].n == 1
    assert out[("click", "view")].p_micro == 1_000_000
    # per-from probabilities sum to ~1e6 (floor-division remainder only)
    from collections import defaultdict

    sums = defaultdict(int)
    for (f, _t), r in out.items():
        sums[f] += r.p_micro
    assert all(1_000_000 - 3 <= s <= 1_000_000 for s in sums.values())


def test_dp_counts_noise_bounded_and_seeded(spark):
    """Laplace(1) noise at u in (1e-6, 1-1e-6) is bounded by
    |ln(2e-6)| ~ 13.1; the release must stay within that envelope of
    the true counts, be reproducible run-to-run, and never echo the
    true count column."""
    sf = "/root/testdata/sf0.001"
    out1 = QUERIES["x_dp_counts"](spark, sf).collect()
    out2 = QUERIES["x_dp_counts"](spark, sf).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert "n" not in out1[0].asDict()
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from pyspark.sql import functions as F

    truth = {
        (r.event_type, r.dow0): r.n
        for r in load(spark, sf, "events")
        .groupBy("event_type", (F.dayofweek("ts") - 1).alias("dow0"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    max_noise = 14  # ceil(|ln(2e-6)|) + floor slack
    devs = set()
    for r in out1:
        dev = r.noisy_count - truth[(r.event_type, r.dow0)]
        assert abs(dev) <= max_noise, (r, dev)
        devs.add(dev)
    assert len(devs) > 1  # noise actually varies across cells


def test_multitouch_credit_math(spark):
    # user 1: clicks at t0,t5,t10,t15 then purchase at t20 -> n=4,
    # first 40%, last 40%, two middles 10% each (200000 div 2).
    # user 2: single click -> 100% first, 0 last. user 3: two clicks ->
    # 40/40, no middle. user 4: no clicks -> absent (last-touch covers).
    rows = [
        (1, 0, 1, "click"), (2, 5, 1, "click"), (3, 10, 1, "click"),
        (4, 15, 1, "click"), (5, 20, 1, "purchase"),
        (10, 0, 2, "click"), (11, 5, 2, "purchase"),
        (20, 0, 3, "click"), (21, 5, 3, "click"), (22, 10, 3, "purchase"),
        (31, 5, 4, "purchase"),
    ]
    tmp = tempfile.mkdtemp(prefix="mt_")
    try:
        _write(_events_df(spark, rows), tmp, "events")
        out = {
            r.purchase_id: r
            for r in QUERIES["x_multitouch_attribution"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    r = out[5]
    assert (r.n_touch, r.first_click_id, r.last_click_id) == (4, 1, 4)
    assert (r.credit_first_micro, r.credit_last_micro) == (400_000, 400_000)
    assert r.credit_mid_each_micro == 100_000
    r = out[11]
    assert (r.n_touch, r.credit_first_micro, r.credit_last_micro) == (
        1, 1_000_000, 0)
    r = out[22]
    assert (r.n_touch, r.credit_first_micro, r.credit_last_micro,
            r.credit_mid_each_micro) == (2, 400_000, 400_000, 0)
    assert 31 not in out


def test_rfm_tiers_partition_customers_exactly(spark):
    """Every customer lands in exactly one tier per dimension and tier
    sizes differ by at most 1 (the (3(r-1)) div n equal-height cut)."""
    out = QUERIES["x_rfm_segments"](spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_customers for r in out)
    from public_transit_status_with_apache_kafka_spark.io_util import load

    n_cust = (
        load(spark, "/root/testdata/sf0.001", "orders")
        .select("o_custkey").distinct().count()
    )
    assert total == n_cust
    for dim in ("r_tier", "f_tier", "m_tier"):
        per = {}
        for r in out:
            per[getattr(r, dim)] = per.get(getattr(r, dim), 0) + r.n_customers
        assert set(per) == {0, 1, 2}
        assert max(per.values()) - min(per.values()) <= 1


def test_temporal_reach_respects_time_ordering(spark):
    # edges with dates (days): cust1 -S7 @ day 10; S7 -cust20 @ day 5
    # (BEFORE arrival at S7 -> unusable); S7 -cust21 @ day 12 (usable).
    # Static BFS would reach 20; temporal reach must NOT.
    import datetime as dt

    tx = [(1, 7, 10), (20, 7, 5), (21, 7, 12)]
    orders = spark.createDataFrame(
        [(i, c, dt.datetime(1970, 1, 1) + dt.timedelta(days=d))
         for i, (c, _, d) in enumerate(tx)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(i, s) for i, (_, s, _) in enumerate(tx)],
        "l_orderkey long, l_suppkey long",
    )
    tmp = tempfile.mkdtemp(prefix="tr_")
    try:
        _write(orders, tmp, "orders")
        _write(lineitem, tmp, "lineitem")
        out = {r.node: r.arrival_day
               for r in QUERIES["x_temporal_reach"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[1] == 0
    assert out[1_000_007] == 10  # via the day-10 edge
    assert out[21] == 12  # day 12 >= arrival 10: traversable
    assert 20 not in out  # day-5 edge predates arrival at S7


def test_hits_two_round_hand_computed(spark):
    # bipartite: cust1 -> {S7, S8}, cust2 -> {S7}
    # a1: 7->2, 8->1 ; h1: 1->3, 2->2 ; a2: 7->5, 8->3 ; h2: 1->8, 2->5
    edges = [(1, 7), (1, 8), (2, 7)]
    o, li = _orders_lineitem(spark, edges)
    tmp = tempfile.mkdtemp(prefix="hits_")
    try:
        _write(o, tmp, "orders")
        _write(li, tmp, "lineitem")
        out = {
            (r.role, r.node): r.score
            for r in QUERIES["x_hits_scores"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[("authority", 7)] == 5
    assert out[("authority", 8)] == 3
    assert out[("hub", 1)] == 8
    assert out[("hub", 2)] == 5
