"""Product-analytics extensions: funnel steps, retention cohorts,
deterministic per-group mode. All three are oracle-verified; these pin
the ordering semantics the SQL shape could silently get wrong."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.plans.relational import QUERIES

SF = "/root/testdata/sf0.001"


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t, 0.0, "{}")
         for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _run_funnel(spark, df):
    import shutil, tempfile, os

    tmp = tempfile.mkdtemp(prefix="funnel_")
    try:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        return {r.user_id: r for r in QUERIES["x_funnel_steps"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_funnel_requires_ordered_sequence(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
        # user 2: click BEFORE first view -> stops at step 1
        (2, 1, 2, "click"), (2, 2, 2, "view"),
        # user 3: purchase before click -> stops at step 2
        (3, 1, 3, "view"), (3, 2, 3, "purchase"), (3, 3, 3, "click"),
        # user 4: never viewed -> absent from the funnel entirely
        (4, 1, 4, "click"), (4, 2, 4, "purchase"),
    ]
    out = _run_funnel(spark, _events_df(spark, rows))
    assert out[1].reached_step == 3 and out[1].t3_ms is not None
    assert out[2].reached_step == 1 and out[2].t2_ms is None
    assert out[3].reached_step == 2 and out[3].t3_ms is None
    assert 4 not in out


def test_funnel_simultaneous_ts_is_strict(spark):
    # click at the SAME timestamp as the first view does not advance
    rows = [(5, 1, 1, "view"), (5, 1, 1, "click")]
    out = _run_funnel(spark, _events_df(spark, rows))
    assert out[1].reached_step == 1


def test_retention_every_cohort_counts_itself_at_offset_zero(spark):
    out = QUERIES["x_retention_cohorts"](spark, SF).collect()
    assert out
    by_cohort = {}
    for r in out:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week_ms, {})[r.week_offset] = r.n_users
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets  # first week always contains the cohort
        # retention can never exceed the cohort's own size
        assert all(n <= offsets[0] for n in offsets.values())


def test_mode_per_group_tie_breaks_lexicographically(spark):
    import shutil, tempfile, os

    rows = [
        (1, 1, 1, "view"), (2, 2, 1, "click"),          # tie: click vs view
        (3, 1, 2, "error"), (4, 2, 2, "error"), (5, 3, 2, "view"),
    ]
    df = _events_df(spark, [(d, h, u, t) for d, h, u, t in
                            [(1, 1, 1, "view"), (2, 2, 1, "click"),
                             (1, 1, 2, "error"), (2, 2, 2, "error"), (3, 3, 2, "view")]])
    tmp = tempfile.mkdtemp(prefix="mode_")
    try:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = {r.user_id: r for r in QUERIES["x_mode_per_group"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out[1].mode_type == "click" and out[1].cnt == 1  # tie -> lexicographic
    assert out[2].mode_type == "error" and out[2].cnt == 2


def test_incremental_agg_equals_full_recompute(spark):
    """The incremental base⊕delta merge must equal a from-scratch
    groupBy over the union range — checked inside one engine here (the
    oracle proves it cross-engine)."""
    from pyspark.sql import functions as F
    from public_transit_status_with_apache_kafka_spark.io_util import load

    inc = QUERIES["x_incremental_agg_maintenance"](spark, SF)
    orders = load(spark, SF, "orders").filter(F.col("o_orderdate") < "1998-07-01")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    full = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        (F.sum(cents) / F.lit(100.0)).alias("total_spend"),
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_similarity_histogram_buckets_partition_pair_mass(spark):
    """Histogram counts must sum to the total pair count and every
    bucket must be a valid Jaccard decile."""
    from public_transit_status_with_apache_kafka_spark.plans.llm_data import (
        QUERIES as LLM_QUERIES,
    )
    from public_transit_status_with_apache_kafka_spark.io_util import load
    from public_transit_status_with_apache_kafka_spark.operators import dedup

    rows = LLM_QUERIES["e2_similarity_histogram"](spark, SF).collect()
    assert rows
    assert all(0 <= r.bucket <= 10 for r in rows)
    sh = dedup.shingle_hashes_arrow(
        load(spark, SF, "documents"), "text", "doc_id", k=3, spread=True
    )
    n_pairs = dedup.jaccard_pairs(sh, max_df=1000).count()
    assert sum(r.n_pairs for r in rows) == n_pairs


def test_temporal_split_embargo_holds(spark):
    """The purge gap is real: max train ts < cutoff, min test ts >=
    cutoff + embargo, and no event inside the gap is in either split."""
    import datetime as dt

    from public_transit_status_with_apache_kafka_spark.io_util import load

    out = {r.split: r for r in QUERIES["x_temporal_split"](spark, SF).collect()}
    assert set(out) == {"train", "test"}
    cutoff = dt.datetime(2024, 1, 20, tzinfo=dt.timezone.utc).timestamp() * 1000
    test_start = dt.datetime(2024, 1, 22, tzinfo=dt.timezone.utc).timestamp() * 1000
    assert out["train"].max_ts_ms < cutoff
    assert out["test"].min_ts_ms >= test_start
    e = load(spark, SF, "events")
    total = e.count()
    gap = e.filter(
        (F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-22")
    ).count()
    assert out["train"].n_events + out["test"].n_events == total - gap
    assert gap > 0  # the embargo actually excludes something here
