"""Round-8 HTTP integration shims: Schema Registry REST protocol,
Kafka Connect REST + JDBC-incrementing flow, dashboard serving loop —
the two round-7 "What's missing" items (live Confluent HTTP paths,
Tornado serving loop), exercised over REAL sockets via urllib."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.sources import kafka_sim
from public_transit_status_with_apache_kafka_spark.sources.connect_sim import (
    SimKafkaConnect,
    configure_connector,
)
from public_transit_status_with_apache_kafka_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SimSchemaRegistry,
)

SCHEMA = {
    "type": "record",
    "name": "probe",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": "string"},
    ],
}


def test_registry_rest_protocol_roundtrip():
    with SimSchemaRegistry() as reg:
        c = SchemaRegistryClient(reg.url)
        sid = c.register("probe-value", SCHEMA)
        assert sid == 1
        # canonical dedup: whitespace/key-order variants -> SAME id
        alt = json.dumps(SCHEMA, indent=3)
        assert c.register("probe-value", alt) == sid
        assert c.register("other-value", alt) == sid  # same schema, new subject
        # a genuinely different schema gets a new id
        other = dict(SCHEMA, name="probe2")
        assert c.register("probe-value", other) == 2
        got = json.loads(c.get_by_id(sid))
        assert [f["name"] for f in got["fields"]] == ["k", "v"]
        latest = c.get_latest("probe-value")
        assert latest["id"] == 2 and latest["version"] == 2
        # wire-level details: content type + registry error body
        with urllib.request.urlopen(f"{reg.url}/schemas/ids/1") as resp:
            assert resp.headers["Content-Type"].startswith(
                "application/vnd.schemaregistry.v1+json"
            )
        with pytest.raises(RuntimeError, match="40403"):
            c.get_by_id(999)
        with pytest.raises(RuntimeError, match="40401"):
            c.get_latest("nope-value")


def test_registry_decode_confluent_avro_from_executors(spark):
    """The real consumer topology: producer registers over HTTP,
    frames with the ASSIGNED id; executors resolve the writer schema
    BY id over HTTP (process-cached) and decode."""
    from public_transit_status_with_apache_kafka_spark.sources import avro_codec
    from public_transit_status_with_apache_kafka_spark.sources.schema_registry import (
        registry_decode_confluent_avro,
    )

    with SimSchemaRegistry() as reg:
        client = SchemaRegistryClient(reg.url)
        sid = client.register("probe-value", SCHEMA)
        fields = avro_codec._parse_schema(json.dumps(SCHEMA))
        rows = [
            (avro_codec.confluent_frame(
                avro_codec.encode_record({"k": i, "v": f"val{i}"}, fields), sid
            ),)
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "value binary")
        out = {
            r.k: r.v
            for r in registry_decode_confluent_avro(
                df, reg.url, "k long, v string"
            ).collect()
        }
        assert out == {i: f"val{i}" for i in range(50)}


REF_CONFIG = {
    # the reference's JdbcSourceConnector config, producers/connector.py:30-48
    "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
    "key.converter": "org.apache.kafka.connect.json.JsonConverter",
    "key.converter.schemas.enable": "false",
    "value.converter": "org.apache.kafka.connect.json.JsonConverter",
    "value.converter.schemas.enable": "false",
    "batch.max.rows": "500",
    "connection.url": "jdbc:postgresql://localhost:5432/cta",
    "connection.user": "cta_admin",
    "connection.password": "chicago",
    "table.whitelist": "stations",
    "mode": "incrementing",
    "incrementing.column.name": "stop_id",
    "topic.prefix": "org.chicago.cta.",
    "poll.interval.ms": 60000,
}


def test_connect_rest_jdbc_incrementing_flow(spark, tmp_path):
    """The stations flow end to end: configure over HTTP with the
    reference-faithful config, poll -> rows land on the broker topic
    as JSON keyed by stop_id, high-water mark skips old rows."""
    from public_transit_status_with_apache_kafka_spark.generator import (
        generate_stations,
    )

    table = str(tmp_path / "stations_tbl")
    generate_stations(spark).write.parquet(table)
    n_all = spark.read.parquet(table).count()
    broker = kafka_sim.SimBroker(str(tmp_path / "log"), default_partitions=1)

    with SimKafkaConnect(
        broker, {"stations": lambda: spark.read.parquet(table)}
    ) as kc:
        assert configure_connector(kc.url, "stations", REF_CONFIG) is True
        # idempotent recreation: the reference's GET-then-skip path
        assert configure_connector(kc.url, "stations", REF_CONFIG) is False
        with urllib.request.urlopen(
            f"{kc.url}/connectors/stations/status"
        ) as resp:
            status = json.loads(resp.read())
        assert status["connector"]["state"] == "RUNNING"

        assert kc.poll_once("stations") == n_all
        assert kc.poll_once("stations") == 0  # mark advanced, nothing new

        # new rows appear -> only the delta is delivered
        spark.read.parquet(table).withColumn(
            "stop_id", F.col("stop_id") + 100000
        ).write.mode("append").parquet(table)
        assert kc.poll_once("stations") == n_all

        kafka_sim.register(spark)
        msgs = (
            spark.read.format("kafkasim")
            .option("subscribe", "org.chicago.cta.stations")
            .load(broker.log_dir)
        )
        assert msgs.count() == 2 * n_all
        decoded = json.loads(bytes(msgs.first().value))
        assert "stop_id" in decoded and "station_name" in decoded

        # misconfiguration fails loudly with the API's error body
        bad = dict(REF_CONFIG, mode="bulk")
        with pytest.raises(RuntimeError, match="unsupported mode"):
            configure_connector(kc.url, "bulk_one", bad)
        missing = {k: v for k, v in REF_CONFIG.items() if k != "batch.max.rows"}
        with pytest.raises(RuntimeError, match="batch.max.rows"):
            configure_connector(kc.url, "missing_one", missing)

        # DELETE then recreate
        req = urllib.request.Request(
            f"{kc.url}/connectors/stations", method="DELETE"
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        assert configure_connector(kc.url, "stations", REF_CONFIG) is True


def test_connect_batch_max_rows_caps_each_poll(spark, tmp_path):
    table = str(tmp_path / "t")
    spark.range(120).select(
        F.col("id").alias("stop_id"), F.col("id").cast("string").alias("name")
    ).write.parquet(table)
    broker = kafka_sim.SimBroker(str(tmp_path / "log"), default_partitions=1)
    cfg = dict(REF_CONFIG, **{"table.whitelist": "t", "batch.max.rows": "50"})
    with SimKafkaConnect(broker, {"t": lambda: spark.read.parquet(table)}) as kc:
        configure_connector(kc.url, "t", cfg)
        assert [kc.poll_once("t") for _ in range(4)] == [50, 50, 20, 0]


def test_dashboard_http_serves_real_rendered_view(spark):
    """End to end K6: the fixture dashboard rendered per request and
    served over HTTP — the Tornado handler's template-per-GET shape
    (consumers/server.py:34-39) with the engine's real render."""
    from public_transit_status_with_apache_kafka_spark.generator import generate_all
    from public_transit_status_with_apache_kafka_spark.operators import cta_views
    from public_transit_status_with_apache_kafka_spark.streaming.render import (
        render_dashboard,
    )
    from public_transit_status_with_apache_kafka_spark.streaming.server import (
        DashboardServer,
    )

    fx = generate_all(spark)
    dash = cta_views.dashboard(
        cta_views.stations_dim(fx["stations"]),
        cta_views.train_positions(fx["arrivals"]),
        cta_views.turnstile_counts(fx["turnstile"]),
    ).localCheckpoint()

    with DashboardServer(lambda: render_dashboard(dash)) as srv:
        with urllib.request.urlopen(srv.url + "/") as resp:
            page = resp.read().decode()
    assert "== Blue Line ==" in page and "station" in page
    assert '<meta http-equiv="refresh" content="10">' in page


def test_dashboard_http_serving_loop(spark):
    """K6 transport: GET / serves the rendered dashboard with the
    reference's 10 s meta-refresh; every request re-renders, so the
    next refresh cycle sees updated state."""
    from public_transit_status_with_apache_kafka_spark.streaming.server import (
        DashboardServer,
    )

    state = {"html": "station_a  ---  BL001  7"}
    with DashboardServer(lambda: state["html"]) as srv:
        with urllib.request.urlopen(srv.url + "/") as resp:
            page = resp.read().decode()
            assert resp.headers["Content-Type"].startswith("text/html")
        assert '<meta http-equiv="refresh" content="10">' in page
        assert "BL001" in page and "CTA Status" in page
        state["html"] = "station_a  ---  BL777  9"
        with urllib.request.urlopen(srv.url + "/") as resp:
            assert "BL777" in resp.read().decode()
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(srv.url + "/nope")
