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
