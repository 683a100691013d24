"""S3 incrementing-column poller: only-new-rows delivery, batch caps,
and high-water-mark persistence across polls (the Kafka Connect JDBC
incrementing-mode contract)."""

from __future__ import annotations

from public_transit_status_with_apache_kafka_spark.generator import generate_stations
from public_transit_status_with_apache_kafka_spark.sources.incremental import (
    IncrementingPoller,
)


def test_poller_delivers_each_row_once(spark, tmp_path):
    path = str(tmp_path / "stations")
    generate_stations(spark).write.parquet(path)
    total = spark.read.parquet(path).count()

    poller = IncrementingPoller(
        lambda: spark.read.parquet(path), "stop_id", batch_max_rows=10
    )
    seen: list[int] = []
    for _ in range(20):
        batch = poller.poll().collect()
        if not batch:
            break
        seen.extend(r.stop_id for r in batch)
    assert len(seen) == total
    assert sorted(seen) == seen == list(range(total))  # ordered, no dups/gaps


def test_poller_picks_up_appends(spark, tmp_path):
    """New rows appended between polls are delivered on the next poll —
    the 60s re-poll loop of the connector."""
    path = str(tmp_path / "inc")
    spark.createDataFrame([(i,) for i in range(5)], "stop_id int").write.parquet(path)
    poller = IncrementingPoller(lambda: spark.read.parquet(path), "stop_id")
    assert sorted(r.stop_id for r in poller.poll().collect()) == [0, 1, 2, 3, 4]
    assert poller.poll().count() == 0  # drained

    spark.createDataFrame([(i,) for i in range(5, 8)], "stop_id int").write.mode(
        "append"
    ).parquet(path)
    assert sorted(r.stop_id for r in poller.poll().collect()) == [5, 6, 7]
    assert poller.mark == 7


def test_poller_releases_previous_batch_cache(spark):
    """ADVICE r1: a long-lived poller must not leak storage — each poll
    unpersists the previous batch; release() drops the last one."""
    from public_transit_status_with_apache_kafka_spark.sources.incremental import (
        IncrementingPoller,
    )

    df = spark.range(100).withColumnRenamed("id", "stop_id")
    with IncrementingPoller(lambda: df, "stop_id", batch_max_rows=40) as p:
        b1 = p.poll()
        assert b1.count() == 40
        assert b1.storageLevel.useMemory  # cached while current
        b2 = p.poll()
        assert b2.count() == 40
        assert not b1.storageLevel.useMemory  # previous batch released
        assert b2.storageLevel.useMemory
    assert not b2.storageLevel.useMemory  # context exit releases the last
