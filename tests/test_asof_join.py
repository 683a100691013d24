"""As-of join semantics on hand-built frames: latest at-or-before
match per key, exact-timestamp inclusion, null fill for rows with no
preceding right row, one output row per left row."""

from __future__ import annotations

import datetime as dt

from public_transit_status_with_apache_kafka_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 10, _ts(2)), (4, 99, _ts(30))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), "a"), (10, _ts(5), "b"), (10, _ts(15), "c"), (77, _ts(0), "x")],
        "k long, rts timestamp, val string",
    )
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_ts="ts", right_ts="rts", value_cols=["val"],
    )
    got = {r.event_id: r.val for r in out.collect()}
    assert got == {
        1: "b",   # rts == ts counts (at-or-before)
        2: "c",   # latest preceding
        3: None,  # right rows exist for k but none at-or-before 00:02
        4: None,  # key absent on the right entirely
    }
    assert out.count() == left.count()  # exactly one row per left row


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 99, _ts(5))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame([(10, _ts(1), "a")], "k long, rts timestamp, val string")
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_ts="ts", right_ts="rts", value_cols=["val"], how="inner",
    )
    assert [(r.event_id, r.val) for r in out.collect()] == [(1, "a")]


def test_range_join_bucketed_equals_naive(spark):
    """The bucketed interval-join decomposition must produce exactly the
    broadcast nested-loop result, including intervals spanning multiple
    buckets and values on bucket boundaries."""
    from pyspark.sql import functions as F

    from public_transit_status_with_apache_kafka_spark.operators.asof import (
        range_join,
        range_join_bucketed,
    )

    left = spark.range(1_000).select((F.col("id") * 0.37 % 50).alias("v"))
    right = spark.createDataFrame(
        [(0.0, 5.0, "a"), (5.0, 30.0, "b"), (30.0, 50.0, "c"), (2.5, 47.5, "wide")],
        "lo double, hi double, tag string",
    )
    naive = range_join(left, right, "v", "lo", "hi")
    bucketed = range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=4.0)
    n = {(round(r.v, 6), r.tag) for r in naive.collect()}
    b = {(round(r.v, 6), r.tag) for r in bucketed.collect()}
    assert n == b
    assert len(n) > 1_000  # the 'wide' interval overlaps others


def test_asof_union_formulation_equals_join_formulation(spark):
    """asof_join (join+max_by) and asof_join_union (union+window) must
    agree on every row — including no-match nulls and at-ts matches."""
    from public_transit_status_with_apache_kafka_spark.operators.asof import (
        asof_join_union,
    )

    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 10, _ts(2)), (4, 99, _ts(30))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), "a"), (10, _ts(5), "b"), (10, _ts(15), "c"), (77, _ts(0), "x")],
        "k long, rts timestamp, val string",
    )
    kw = dict(left_on="k", right_on="k", left_ts="ts", right_ts="rts", value_cols=["val"])
    a = {tuple(r) for r in asof_join(left, right, **kw).collect()}
    b = {tuple(r) for r in asof_join_union(left, right, **kw).collect()}
    assert a == b


def test_asof_union_null_value_columns_stay_row_atomic(spark):
    """ADVICE r1: a right row with NULL in one value column and non-NULL
    in another must be taken whole — per-column last(ignorenulls) would
    stitch columns from DIFFERENT right rows. Both formulations must
    agree and reflect exactly the matched row."""
    from public_transit_status_with_apache_kafka_spark.operators.asof import (
        asof_join_union,
    )

    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30))], "event_id long, k long, ts timestamp"
    )
    # latest-at-or-before for both left rows has val_a NULL: the older
    # row's non-NULL val_a must NOT bleed through
    right = spark.createDataFrame(
        [(10, _ts(1), "old_a", 1.0), (10, _ts(5), None, 2.0), (10, _ts(25), None, 3.0)],
        "k long, rts timestamp, val_a string, val_b double",
    )
    kw = dict(
        left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        value_cols=["val_a", "val_b"],
    )
    a = {tuple(r) for r in asof_join(left, right, **kw).collect()}
    b = {tuple(r) for r in asof_join_union(left, right, **kw).collect()}
    assert a == b
    got = {r.event_id: (r.val_a, r.val_b) for r in asof_join_union(left, right, **kw).collect()}
    assert got == {1: (None, 2.0), 2: (None, 3.0)}
