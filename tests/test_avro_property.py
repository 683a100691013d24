"""Property-based round-trip of the Avro binary codec (SURVEY.md §5.2
item 4): arbitrary flat records of every supported type must survive
encode -> Confluent framing -> strip -> decode bit-for-bit."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_status_with_apache_kafka_spark.sources import avro_codec

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "boolean"},
        {"name": "ni", "type": ["int", "null"]},
        {"name": "ns", "type": ["null", "string"]},
    ],
}
FIELDS = avro_codec._parse_schema(SCHEMA)


def _f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


records = st.fixed_dictionaries(
    {
        "i": st.integers(-(2**31), 2**31 - 1),
        "l": st.integers(-(2**63), 2**63 - 1),
        "f": st.floats(width=32, allow_nan=False).map(_f32),
        "d": st.floats(allow_nan=False),
        "s": st.text(max_size=200),
        "b": st.booleans(),
        "ni": st.none() | st.integers(-(2**31), 2**31 - 1),
        "ns": st.none() | st.text(max_size=50),
    }
)


@settings(max_examples=300, deadline=None)
@given(rec=records, schema_id=st.integers(0, 2**32 - 1))
def test_roundtrip(rec, schema_id):
    framed = avro_codec.confluent_frame(avro_codec.encode_record(rec, FIELDS), schema_id)
    assert framed[0] == 0
    assert int.from_bytes(framed[1:5], "big") == schema_id
    assert avro_codec.decode_record(framed[5:], FIELDS) == rec


# ------------------------------------------------------------- golden wire

# Golden frames pinning the exact public Confluent wire format
# (magic 0x00 + 4-byte big-endian schema id + Avro binary body), derived
# independently from the Avro 1.x spec (zigzag varints, length-prefixed
# UTF-8, union-index prefix) — NOT produced by this codec. The schemas
# mirror the reference's arrival/turnstile value records
# (producers/models/schemas/*.json; framing semantics of
# producers/models/producer.py:54-58). If either direction of the codec
# drifts from the wire format, these literals catch it.

ARRIVAL_SCHEMA = {
    "type": "record",
    "name": "arrival",
    "fields": [
        {"name": "station_id", "type": "long"},
        {"name": "train_id", "type": "string"},
        {"name": "direction", "type": "string"},
        {"name": "line", "type": "string"},
        {"name": "train_status", "type": "string"},
        {"name": "prev_station_id", "type": ["null", "long"]},
        {"name": "prev_direction", "type": ["null", "string"]},
    ],
}
ARRIVAL_REC = {
    "station_id": 40010,
    "train_id": "BL123",
    "direction": "b",
    "line": "blue",
    "train_status": "in_service",
    "prev_station_id": None,
    "prev_direction": "a",
}
ARRIVAL_GOLDEN = bytes.fromhex(
    "000000000794f1040a424c313233026208626c756514696e5f7365727669636500020261"
)

TURNSTILE_SCHEMA = {
    "type": "record",
    "name": "turnstile",
    "fields": [
        {"name": "timestamp", "type": "long"},
        {"name": "station_id", "type": "long"},
        {"name": "num_entries", "type": "long"},
    ],
}
TURNSTILE_REC = {"timestamp": 1596111600000, "station_id": 40010, "num_entries": 2}
TURNSTILE_GOLDEN = bytes.fromhex("000000002a80e6d1faf35c94f10404")


def test_confluent_golden_encode():
    for schema, rec, schema_id, golden in [
        (ARRIVAL_SCHEMA, ARRIVAL_REC, 7, ARRIVAL_GOLDEN),
        (TURNSTILE_SCHEMA, TURNSTILE_REC, 42, TURNSTILE_GOLDEN),
    ]:
        fields = avro_codec._parse_schema(schema)
        frame = avro_codec.confluent_frame(avro_codec.encode_record(rec, fields), schema_id)
        assert frame == golden
        # header structure: magic byte then big-endian schema id
        assert frame[0] == 0
        assert int.from_bytes(frame[1:5], "big") == schema_id


def test_confluent_golden_decode():
    for schema, rec, schema_id, golden in [
        (ARRIVAL_SCHEMA, ARRIVAL_REC, 7, ARRIVAL_GOLDEN),
        (TURNSTILE_SCHEMA, TURNSTILE_REC, 42, TURNSTILE_GOLDEN),
    ]:
        fields = avro_codec._parse_schema(schema)
        got_id, payload = avro_codec.strip_confluent_frame(golden)
        assert got_id == schema_id
        assert avro_codec.decode_record(payload, fields) == rec
