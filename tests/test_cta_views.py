"""Golden tests for the four derived views + dashboard over the
deterministic CTA fixtures (SURVEY.md §5.2 item 2).

Fixture shape (generator.py defaults): 3 lines x 6 stations, 2 stop rows
per station, 2 trains/line shuttling for 20 ticks, ~hourly weather."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark import generator
from public_transit_status_with_apache_kafka_spark.operators import cta_views


@pytest.fixture(scope="module")
def fx(spark):
    return generator.generate_all(spark)


def test_stations_dim_collapses_stop_rows(spark, fx):
    dim = cta_views.stations_dim(fx["stations"]).collect()
    # 36 stop rows -> 18 stations (A2 latest-per-key)
    assert len(dim) == 18
    by_id = {r.station_id: r for r in dim}
    assert set(by_id) == {li * 100 + o for li in range(3) for o in range(6)}
    # P2 line derivation first-true-wins
    assert by_id[0].line == "blue" and by_id[100].line == "green" and by_id[200].line == "red"
    # P1 projection keeps order
    assert by_id[103].order == 3


def test_turnstile_counts_match_event_multiplicity(spark, fx):
    """A1/A7 invariant: sum of per-station counts == total event rows."""
    t = fx["turnstile"]
    counts = cta_views.turnstile_counts(t)
    assert counts.agg(F.sum("count")).first()[0] == t.count()
    # every station with >=1 rider appears exactly once
    assert counts.groupBy("station_id").count().filter("count > 1").count() == 0


def test_train_positions_conservation(spark, fx):
    """After replaying all arrivals, each line still has exactly
    n_trains distinct occupying trains (arrive/depart tombstones
    conserve trains)."""
    pos = cta_views.train_positions(fx["arrivals"]).filter(F.col("train_id").isNotNull())
    rows = pos.collect()
    by_line: dict[str, set] = {}
    for r in rows:
        by_line.setdefault(r.train_id[0], set()).add(r.train_id)
    # 2 trains per line, none lost, none duplicated across slots
    assert {k: len(v) for k, v in by_line.items()} == {"B": 2, "G": 2, "R": 2}
    assert len(rows) == 6  # each occupies exactly one (station, direction)


def test_weather_now_is_latest(spark, fx):
    w = fx["weather"]
    latest = w.orderBy(F.desc("ts")).first()
    now = cta_views.weather_now(w).first()
    assert now.temperature == latest.temperature
    assert now.status == latest.status.replace("_", " ").title()


def test_dashboard_assembly_defaults(spark, fx):
    dim = cta_views.stations_dim(fx["stations"])
    pos = cta_views.train_positions(fx["arrivals"])
    counts = cta_views.turnstile_counts(fx["turnstile"])
    dash = cta_views.dashboard(dim, pos, counts)
    rows = dash.collect()
    assert len(rows) == 18  # one row per station
    # O2 ordering: blue block, then green, then red; order ascending within
    lines = [r.line for r in rows]
    assert lines == ["blue"] * 6 + ["green"] * 6 + ["red"] * 6
    assert [r.order for r in rows[:6]] == list(range(6))
    # J5 defaults: empty slots render '---', missing counts 0
    assert all(r.train_a == "---" or r.train_a[0] in "BGR" for r in rows)
    assert all(r.entries >= 0 for r in rows)
    # at least one occupied slot exists
    assert any(r.train_a != "---" or r.train_b != "---" for r in rows)


def test_dashboard_matches_registered_query(spark):
    """cta_fixture_dashboard in the registry is this exact pipeline."""
    import __spark_entry__ as entry

    q = entry.queries()["cta_fixture_dashboard"]
    assert q(spark, "/root/testdata/sf0.001").count() == 18
