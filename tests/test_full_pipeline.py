"""The whole reference system end-to-end in streaming mode (SURVEY §3):
four concurrent streaming queries maintain the derived views (stations
dim, turnstile counts, train positions, weather) from file-source
replays; the dashboard then snapshot-joins the serving views — exactly
the reference's Tornado server collapsed into one SparkSession — and
must equal the batch dashboard on identical input."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark import generator
from public_transit_status_with_apache_kafka_spark.operators import cta_views
from public_transit_status_with_apache_kafka_spark.streaming import views as sv
from public_transit_status_with_apache_kafka_spark.streaming.render import (
    render_dashboard,
)


def test_full_streaming_dashboard_equals_batch(spark, tmp_path):
    fx = generator.generate_all(spark)
    dirs = {}
    for name, df in fx.items():
        path = str(tmp_path / name)
        split_col = {"stations": "stop_id"}.get(name, "ts")
        df.repartitionByRange(3, F.col(split_col)).write.parquet(path)
        dirs[name] = path

    streams = {
        "srv_dim": sv.stations_dim_stream(
            sv.stream_from_directory(spark, dirs["stations"], generator.STATIONS_SCHEMA)
        ),
        "srv_counts": sv.turnstile_counts_stream(
            sv.stream_from_directory(spark, dirs["turnstile"], generator.TURNSTILE_SCHEMA)
        ),
        "srv_pos": sv.train_positions_stream(
            sv.stream_from_directory(spark, dirs["arrivals"], generator.ARRIVALS_SCHEMA)
        ),
        "srv_weather": sv.weather_now_stream(
            sv.stream_from_directory(spark, dirs["weather"], generator.WEATHER_SCHEMA)
        ),
    }
    queries = [sv.start_memory_view(df, name) for name, df in streams.items()]
    try:
        for q in queries:
            q.processAllAvailable()
        # the dashboard snapshot: join the SERVING views (memory sink
        # tables), the reference's per-GET render path (K6/J5/O2)
        snap = cta_views.dashboard(
            spark.table("srv_dim"),
            spark.table("srv_pos"),
            spark.table("srv_counts"),
        )
        streaming_rows = [tuple(r) for r in snap.collect()]
        batch_rows = [
            tuple(r)
            for r in cta_views.dashboard(
                cta_views.stations_dim(fx["stations"]),
                cta_views.train_positions(fx["arrivals"]),
                cta_views.turnstile_counts(fx["turnstile"]),
            ).collect()
        ]
        assert streaming_rows == batch_rows  # ordered comparison (O2)

        # weather header served from the streaming view
        w_stream = spark.table("srv_weather").first()
        w_batch = cta_views.weather_now(fx["weather"]).first()
        assert (w_stream.temperature, w_stream.status) == (
            w_batch.temperature,
            w_batch.status,
        )

        # and the rendered page is identical from either path
        assert render_dashboard(snap, w_stream) == render_dashboard(
            cta_views.dashboard(
                cta_views.stations_dim(fx["stations"]),
                cta_views.train_positions(fx["arrivals"]),
                cta_views.turnstile_counts(fx["turnstile"]),
            ),
            w_batch,
        )
    finally:
        for q in queries:
            q.stop()
