"""K2: REST-proxy sink payload construction.

Pins the POST body to the exact envelope the reference's weather
producer sends (producers/models/weather.py:74-88): double-encoded
schema strings, records as {"key":…,"value":…} objects, and the
application/vnd.kafka.avro.v2+json content type.
"""

from __future__ import annotations

import json

from public_transit_status_with_apache_kafka_spark.sources import rest_proxy

KEY_SCHEMA = {"type": "record", "name": "k", "fields": [{"name": "ts", "type": "long"}]}
VALUE_SCHEMA = {
    "type": "record",
    "name": "v",
    "fields": [
        {"name": "temperature", "type": "double"},
        {"name": "status", "type": "string"},
    ],
}


def _weather_df(spark, n=7):
    rows = [(1000 + i, 40.0 + i, "sunny" if i % 2 == 0 else "windy") for i in range(n)]
    return spark.createDataFrame(rows, "ts long, temperature double, status string")


def test_record_json_is_key_value_object(spark):
    df = _weather_df(spark, n=1)
    [row] = rest_proxy.record_json(df, ["ts"], ["temperature", "status"]).collect()
    rec = json.loads(row.record)
    assert rec == {
        "key": {"ts": 1000},
        "value": {"temperature": 40.0, "status": "sunny"},
    }


def test_post_body_matches_reference_envelope(spark):
    df = _weather_df(spark, n=7).coalesce(1)
    bodies = rest_proxy.post_bodies(
        df, ["ts"], ["temperature", "status"], KEY_SCHEMA, VALUE_SCHEMA, batch_size=3
    ).collect()
    # 7 records in one partition at batch_size=3 -> 3 + 3 + 1
    sizes = sorted(len(json.loads(b.body)["records"]) for b in bodies)
    assert sizes == [1, 3, 3]
    parsed = json.loads(bodies[0].body)
    assert set(parsed) == {"key_schema", "value_schema", "records"}
    # schemas are embedded as JSON *strings*, exactly like the reference
    assert json.loads(parsed["key_schema"]) == KEY_SCHEMA
    assert json.loads(parsed["value_schema"]) == VALUE_SCHEMA
    rec = parsed["records"][0]
    assert set(rec) == {"key", "value"}
    assert set(rec["value"]) == {"temperature", "status"}
    # all 7 records survive chunking, none duplicated
    all_keys = sorted(
        r["key"]["ts"] for b in bodies for r in json.loads(b.body)["records"]
    )
    assert all_keys == list(range(1000, 1007))
    assert rest_proxy.REST_PROXY_CONTENT_TYPE == "application/vnd.kafka.avro.v2+json"


def test_chunking_is_per_partition_no_shuffle(spark):
    df = _weather_df(spark, n=10).repartition(2)
    plan = rest_proxy.post_bodies(
        df, ["ts"], ["temperature", "status"], KEY_SCHEMA, VALUE_SCHEMA, batch_size=4
    )._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the explicit repartition in the fixture
    assert plan.count("Exchange") == 1
