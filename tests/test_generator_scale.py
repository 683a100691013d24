"""Distributed generator checks: partition-independent determinism,
walk continuity (lag-derived prev_* matches the train's actual previous
arrival), A7 fan-out conservation, and clamp invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark import generator_scale as gs
from public_transit_status_with_apache_kafka_spark.operators import cta_views


def test_arrivals_deterministic_across_partitioning(spark):
    a = gs.arrivals_at_scale(spark, 3000).collect()
    b = gs.arrivals_at_scale(spark, 3000)
    b = b.repartition(13).collect()  # different physical layout, same rows
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_arrivals_walk_continuity(spark):
    """Each event's prev_station_id must equal the same train's previous
    event's station_id (and be NULL only on the first event)."""
    arr = gs.arrivals_at_scale(spark, 2000)
    from pyspark.sql.window import Window

    w = Window.partitionBy("train_id").orderBy("seq")
    chk = arr.select(
        "train_id",
        "seq",
        "prev_station_id",
        F.lag("station_id").over(w).alias("expected_prev"),
    )
    bad = chk.filter(
        ~(
            (F.col("prev_station_id").isNull() & F.col("expected_prev").isNull())
            | (F.col("prev_station_id") == F.col("expected_prev"))
        )
    )
    assert bad.count() == 0


def test_arrivals_feed_tombstone_tracker(spark):
    """The scale generator's output drives the A4 view: every line ends
    with <= n_trains occupying trains and no orphan slots."""
    arr = gs.arrivals_at_scale(spark, 5000, n_trains_per_line=4)
    pos = cta_views.train_positions(arr).filter(F.col("train_id").isNotNull())
    per_line = pos.groupBy(F.substring("train_id", 1, 1).alias("l")).count().collect()
    assert all(r["count"] <= 4 for r in per_line)


def test_turnstile_fanout_conservation(spark):
    """Sum of per-station event counts == sum of the per-cell rider
    numbers (A7: count encoded as multiplicity, A1 recovers it)."""
    t = gs.turnstile_at_scale(spark, 500)
    n_events = t.count()
    counts = cta_views.turnstile_counts(t)
    assert counts.agg(F.sum("count")).first()[0] == n_events
    assert n_events > 0


def test_weather_clamped_and_deterministic(spark):
    w1 = gs.weather_at_scale(spark, 500).collect()
    w2 = gs.weather_at_scale(spark, 500).collect()
    assert w1 == w2
    assert all(-20.0 <= r.temperature <= 100.0 for r in w1)
    assert {r.status for r in w1} <= {
        "sunny", "partly_cloudy", "cloudy", "windy", "precipitation"
    }
