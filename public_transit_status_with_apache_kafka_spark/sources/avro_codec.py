"""Minimal Avro *binary* codec for flat record schemas.

The reference produces Confluent-framed Avro events (producers/models/
producer.py:54-58) whose schemas are all flat records of
int/long/float/double/string/boolean and 2-branch null unions
(producers/models/schemas/*.json — see SURVEY.md §1.2). This module
implements exactly that subset of the public Avro 1.x binary spec
(zigzag varints, IEEE little-endian floats, length-prefixed UTF-8,
union-index prefix) so the engine can decode/encode Kafka Avro payloads
offline, where neither the spark-avro JVM module nor a Python avro
package is available.

When the spark-avro jar IS on the classpath, kafka_io.decode_confluent_avro
prefers the JVM ``from_avro`` path; this codec is the portable fallback
and the reference implementation for tests.
"""

from __future__ import annotations

import json
import struct
from typing import Any

_PRIMITIVES = {"int", "long", "float", "double", "string", "boolean", "bytes", "null"}


def _parse_schema(schema_json: str | dict) -> list[tuple[str, Any]]:
    """Flatten a record schema into [(field_name, type_spec)].

    type_spec is either a primitive name or a list (union branches).
    Only flat records of primitives / 2-branch null unions are supported —
    matching every schema the reference ships.
    """
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if schema.get("type") != "record":
        raise ValueError(f"only record schemas supported, got {schema.get('type')!r}")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, str):
            if t not in _PRIMITIVES:
                raise ValueError(f"unsupported field type {t!r} for {f['name']!r}")
        elif isinstance(t, list):
            for b in t:
                if not (isinstance(b, str) and b in _PRIMITIVES):
                    raise ValueError(f"unsupported union branch {b!r} for {f['name']!r}")
        else:
            raise ValueError(f"nested/complex type unsupported for {f['name']!r}")
        fields.append((f["name"], t))
    return fields


# ----------------------------------------------------------------- decode

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos  # zigzag decode


def _read_value(buf: bytes, pos: int, t) -> tuple[Any, int]:
    if isinstance(t, list):  # union: varint branch index, then branch value
        idx, pos = _read_varint(buf, pos)
        return _read_value(buf, pos, t[idx])
    if t == "null":
        return None, pos
    if t in ("int", "long"):
        return _read_varint(buf, pos)
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_varint(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    raise ValueError(f"unsupported type {t!r}")


def decode_record(buf: bytes, fields: list[tuple[str, Any]]) -> dict[str, Any]:
    pos = 0
    out = {}
    for name, t in fields:
        out[name], pos = _read_value(buf, pos, t)
    return out


# ----------------------------------------------------------------- encode

def _write_varint(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag encode (arbitrary-precision-safe)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_value(out: bytearray, v: Any, t) -> None:
    if isinstance(t, list):
        idx = t.index("null") if v is None else next(i for i, b in enumerate(t) if b != "null")
        _write_varint(out, idx)
        _write_value(out, v, t[idx])
        return
    if t == "null":
        return
    if t in ("int", "long"):
        _write_varint(out, int(v))
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t in ("string", "bytes"):
        raw = v.encode("utf-8") if t == "string" else bytes(v)
        _write_varint(out, len(raw))
        out += raw
    else:
        raise ValueError(f"unsupported type {t!r}")


def encode_record(rec: dict[str, Any], fields: list[tuple[str, Any]]) -> bytes:
    out = bytearray()
    for name, t in fields:
        _write_value(out, rec.get(name), t)
    return bytes(out)


def confluent_frame(payload: bytes, schema_id: int) -> bytes:
    """Prepend the Confluent wire-format header: magic 0x00 + 4-byte
    big-endian schema id (public Confluent wire format)."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def strip_confluent_frame(frame: bytes) -> tuple[int, bytes]:
    """Inverse of :func:`confluent_frame`: (schema_id, avro payload).
    Pure-Python twin of kafka_io.strip_confluent_header (the Column
    form used on DataFrames)."""
    if len(frame) < 5 or frame[0] != 0:
        raise ValueError("not a Confluent-framed payload (magic byte != 0)")
    return struct.unpack(">I", frame[1:5])[0], frame[5:]
