"""x_snapshot_diff: CDC-style keyed snapshot diff (full outer join +
null-safe compares). The registered query is oracle-verified; these pin
the operator's semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.plans.relational import (
    QUERIES,
    snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def test_registered_diff_covers_all_three_classes(spark):
    out = QUERIES["x_snapshot_diff"](spark, SF)
    classes = {r.change_type for r in out.select("change_type").distinct().collect()}
    assert classes == {"added", "removed", "changed"}
    # a changed row carries both values and they differ
    row = out.filter(F.col("change_type") == "changed").first()
    assert row.old_price != row.new_price or row.old_status != row.new_status


def test_diff_of_identical_snapshots_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0)],
        "k long, s string, v double",
    )
    out = snapshot_diff(df, df, "k", [("s", "old_s", "new_s"), ("v", "old_v", "new_v")])
    assert out.count() == 0


def test_diff_classifies_hand_built_change(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "k long, s string"
    )
    b = spark.createDataFrame(
        [(2, "y2"), (3, None), (4, "new")], "k long, s string"
    )
    out = {
        r.k: r for r in snapshot_diff(a, b, "k", [("s", "old_s", "new_s")]).collect()
    }
    assert out[1].change_type == "removed" and out[1].new_s is None
    assert out[2].change_type == "changed" and (out[2].old_s, out[2].new_s) == ("y", "y2")
    assert 3 not in out  # NULL == NULL under null-safe compare: unchanged
    assert out[4].change_type == "added" and out[4].old_s is None
