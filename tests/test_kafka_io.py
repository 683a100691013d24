"""Kafka decode-path tests without a broker (SURVEY.md S5-S7, §4.3.1):
synthetic Confluent-framed Avro bytes and JSON bytes run through the
same decode transforms production uses on a Kafka source."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from public_transit_status_with_apache_kafka_spark.sources import avro_codec, kafka_io

ARRIVAL_SCHEMA = {
    "type": "record",
    "name": "arrival",
    "fields": [
        {"name": "station_id", "type": "int"},
        {"name": "train_id", "type": "string"},
        {"name": "direction", "type": "string"},
        {"name": "line", "type": "string"},
        {"name": "train_status", "type": "string"},
        {"name": "prev_station_id", "type": ["int", "null"]},
        {"name": "prev_direction", "type": ["string", "null"]},
    ],
}

RECORDS = [
    {
        "station_id": 40010,
        "train_id": "BL001",
        "direction": "a",
        "line": "blue",
        "train_status": "in_service",
        "prev_station_id": None,
        "prev_direction": None,
    },
    {
        "station_id": 40020,
        "train_id": "RL102",
        "direction": "b",
        "line": "red",
        "train_status": "out_of_service",
        "prev_station_id": 40010,
        "prev_direction": "a",
    },
]


def test_codec_roundtrip():
    fields = avro_codec._parse_schema(ARRIVAL_SCHEMA)
    for rec in RECORDS:
        assert avro_codec.decode_record(avro_codec.encode_record(rec, fields), fields) == rec


def test_codec_negative_and_large_varints():
    fields = avro_codec._parse_schema(
        {"type": "record", "name": "t", "fields": [{"name": "x", "type": "long"}]}
    )
    for v in (0, -1, 1, -2**40, 2**40, 2**62, -(2**62)):
        assert avro_codec.decode_record(avro_codec.encode_record({"x": v}, fields), fields) == {"x": v}


def _framed_df(spark, topic="org.chicago.cta.station.arrivals.test"):
    fields = avro_codec._parse_schema(ARRIVAL_SCHEMA)
    rows = [
        (topic, i, avro_codec.confluent_frame(avro_codec.encode_record(r, fields), 7))
        for i, r in enumerate(RECORDS)
    ]
    return spark.createDataFrame(rows, "topic string, timestamp long, value binary")


def test_confluent_header_columns(spark):
    df = _framed_df(spark)
    out = df.select(
        kafka_io.confluent_schema_id("value").alias("sid"),
        F.length(kafka_io.strip_confluent_header("value")).alias("plen"),
        F.length("value").alias("flen"),
    ).collect()
    assert all(r.sid == 7 for r in out)
    assert all(r.plen == r.flen - 5 for r in out)


def test_decode_confluent_avro_fallback(spark):
    """Full decode path on framed bytes: schema-correct typed columns,
    kafka metadata preserved."""
    decoded = kafka_io.decode_confluent_avro(_framed_df(spark), ARRIVAL_SCHEMA)
    assert [f.name for f in decoded.schema.fields][:2] == ["topic", "timestamp"]
    got = {r.train_id: r for r in decoded.collect()}
    assert got["BL001"].prev_station_id is None
    assert got["RL102"].prev_station_id == 40010
    assert got["RL102"].train_status == "out_of_service"
    assert isinstance(got["BL001"].station_id, int)


def test_avro_struct_type_nullability():
    t = kafka_io.avro_struct_type(ARRIVAL_SCHEMA)
    by_name = {f.name: f for f in t.fields}
    assert not by_name["station_id"].nullable
    assert by_name["prev_station_id"].nullable
    assert isinstance(by_name["prev_station_id"].dataType, T.IntegerType)


def test_decode_json_value_drops_malformed(spark):
    """F6: PERMISSIVE from_json yields a struct of nulls for malformed
    rows; the decode filter drops them."""
    schema = T.StructType(
        [
            T.StructField("STATION_ID", T.IntegerType()),
            T.StructField("COUNT", T.LongType()),
        ]
    )
    rows = [
        ("TURNSTILE_SUMMARY", 0, json.dumps({"STATION_ID": 1, "COUNT": 5}).encode()),
        ("TURNSTILE_SUMMARY", 1, b"not json at all"),
        ("TURNSTILE_SUMMARY", 2, json.dumps({"STATION_ID": 2, "COUNT": 9}).encode()),
    ]
    df = spark.createDataFrame(rows, "topic string, timestamp long, value binary")
    out = kafka_io.decode_json_value(df, schema)
    assert {(r.STATION_ID, r.COUNT) for r in out.collect()} == {(1, 5), (2, 9)}


def test_topic_pattern_routing(spark):
    """S7/F4: the arrivals regex matches per-station topics and nothing
    else; routing on the kafka `topic` column."""
    rows = [
        ("org.chicago.cta.station.arrivals.fullerton", 0, b"x"),
        ("org.chicago.cta.station.arrivals.ohare", 1, b"x"),
        ("org.chicago.cta.weather.v1", 2, b"x"),
        ("org.chicago.cta.stations.table.v1", 3, b"x"),
    ]
    df = spark.createDataFrame(rows, "topic string, timestamp long, value binary")
    matched = df.filter(F.col("topic").rlike(kafka_io.ARRIVALS_TOPIC_PATTERN))
    assert matched.count() == 2


def test_s5_roundtrip_preserves_counts(spark):
    """The registered S5/K1 round-trip query must reproduce the exact
    per-line counts of the pre-encode fixture."""
    import __spark_entry__ as entry
    from public_transit_status_with_apache_kafka_spark.generator import generate_arrivals

    out = {r.line: (r.n_events, r.n_trains) for r in
           entry.queries()["s5_confluent_avro_roundtrip"](spark, "unused").collect()}
    arr = generate_arrivals(spark)
    exp = {
        r.line: (r.n, r.t)
        for r in arr.groupBy("line").agg(
            F.count("*").alias("n"), F.count_distinct("train_id").alias("t")
        ).collect()
    }
    assert out == exp


def test_column_strip_matches_golden_frames(spark):
    """The Column-expression Confluent strip (kafka_io) must agree with
    the pure-Python codec on the independently-derived golden frames:
    same schema id, same payload bytes, and the payload decodes to the
    pinned record."""
    from public_transit_status_with_apache_kafka_spark.sources import avro_codec, kafka_io
    from tests.test_avro_property import (
        ARRIVAL_GOLDEN,
        ARRIVAL_REC,
        ARRIVAL_SCHEMA,
        TURNSTILE_GOLDEN,
        TURNSTILE_REC,
        TURNSTILE_SCHEMA,
    )

    df = spark.createDataFrame(
        [(1, bytearray(ARRIVAL_GOLDEN)), (2, bytearray(TURNSTILE_GOLDEN))],
        "id int, value binary",
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            kafka_io.confluent_schema_id("value").alias("sid"),
            kafka_io.strip_confluent_header("value").alias("payload"),
        ).collect()
    }
    for rid, golden, rec, schema, sid in [
        (1, ARRIVAL_GOLDEN, ARRIVAL_REC, ARRIVAL_SCHEMA, 7),
        (2, TURNSTILE_GOLDEN, TURNSTILE_REC, TURNSTILE_SCHEMA, 42),
    ]:
        py_sid, py_payload = avro_codec.strip_confluent_frame(golden)
        assert rows[rid].sid == sid == py_sid
        assert bytes(rows[rid].payload) == py_payload
        fields = avro_codec._parse_schema(schema)
        assert avro_codec.decode_record(bytes(rows[rid].payload), fields) == rec
