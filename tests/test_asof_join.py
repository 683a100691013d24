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


def test_stratified_asof_equals_union_form(spark):
    """stratified_asof == asof_join_union on a LOW-cardinality key
    (3 keys, deep history spanning partitions): same at-or-before
    semantics, same all-or-nothing struct carry, NULLs where no right
    row precedes — including a key with no right rows at all."""
    import random

    from pyspark.sql import functions as F

    from public_transit_status_with_apache_kafka_spark.operators.asof import (
        asof_join_union,
        stratified_asof,
    )

    random.seed(61)
    left = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3], i * 10 + random.randint(0, 9))
         for i in range(3000)],
        "lid long, k string, ts long",
    )
    # unique (key, ts) on the right; key 'z' has NO right rows; NULL-ts
    # right rows can never match (ts >= NULL is UNKNOWN) and must be
    # dropped up front, not crash pass 1 or forward-fill spuriously
    right = spark.createDataFrame(
        [(key, t, float(t) / 7, f"tag{t % 5}")
         for key in ("x", "y")
         for t in range(5, 30000, 50 if key == "x" else 173)]
        + [("x", None, 999.0, "ghost"), ("z", None, 888.0, "ghost")],
        "rk string, rts long, px double, tag string",
    )

    got = stratified_asof(
        left, right, "k", "rk", "ts", "rts", ["px", "tag"], num_partitions=8
    )
    exp = asof_join_union(left, right, "k", "rk", "ts", "rts", ["px", "tag"])
    g = {r.lid: (r.px, r.tag) for r in got.collect()}
    e = {r.lid: (r.px, r.tag) for r in exp.collect()}
    assert g == e
    assert all(v == (None, None) for lid, v in g.items() if lid % 3 == 2)  # 'z'
    assert any(v != (None, None) for v in g.values())
