"""Core of the clean-room mini-protobuf runtime (see package docstring).

Implements, from the public wire-format spec only:
  - varint / length-delimited encoding and decoding
  - a FileDescriptorProto parser (hand-coded field numbers from the
    public descriptor.proto) producing plain-Python descriptors
  - a message-class factory supporting the proto3 subset the
    StateMessage schema uses: singular scalars (int32, int64, uint32,
    uint64, bool, enum, string, bytes), singular sub-messages, oneofs
    (incl. the proto3-optional synthetic oneof), repeated scalars and
    repeated sub-messages.

Encoding notes (all from the public spec):
  - tag = (field_number << 3) | wire_type; wire types used: 0 = varint,
    2 = length-delimited (1/5 = fixed64/32 are skip-only here).
  - negative int32/int64 encode as the 10-byte two's-complement varint.
  - proto3 drops singular scalars at default value; sub-message and
    oneof members serialize whenever set, even when empty (an empty
    message is tag + length 0 — this is what selects a oneof arm).
  - repeated scalar fields decode from both packed and non-packed form;
    we emit non-packed (the schema's repeated fields are bytes/message,
    which have no packed form).
"""

from __future__ import annotations

# FieldDescriptorProto.Type values (public descriptor.proto)
T_INT64 = 3
T_UINT64 = 4
T_INT32 = 5
T_BOOL = 8
T_STRING = 9
T_MESSAGE = 11
T_BYTES = 12
T_UINT32 = 13
T_ENUM = 14

_VARINT_TYPES = {T_INT64, T_UINT64, T_INT32, T_BOOL, T_UINT32, T_ENUM}
_LEN_TYPES = {T_STRING, T_MESSAGE, T_BYTES}

LABEL_REPEATED = 3

_MASK64 = (1 << 64) - 1


# ------------------------------------------------------------- varints
def write_varint(out: bytearray, value: int) -> None:
    value &= _MASK64  # negatives: 10-byte two's complement
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed(value: int) -> int:
    """Interpret a 64-bit varint as two's-complement signed."""
    return value - (1 << 64) if value >= (1 << 63) else value


def _bounds(buf: bytes, pos: int, n: int) -> int:
    """End offset of an n-byte field body; truncation is an error (a
    Python slice would silently return fewer bytes — the real runtime
    raises on truncated messages and so do we)."""
    end = pos + n
    if end > len(buf):
        raise ValueError("truncated length-delimited field")
    return end


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = read_varint(buf, pos)
        return pos
    if wire_type == 1:
        return _bounds(buf, pos, 8)
    if wire_type == 2:
        n, pos = read_varint(buf, pos)
        return _bounds(buf, pos, n)
    if wire_type == 5:
        return _bounds(buf, pos, 4)
    raise ValueError(f"cannot skip wire type {wire_type}")


# ------------------------------------------ descriptor.proto bootstrap
# Hand-coded schemas: {field_number: (name, kind[, sub_schema])} where
# kind is 's'tring, 'b'ytes, 'i'nt, 'm'essage; '*' suffix = repeated.
_EnumValueDP = {1: ("name", "s"), 2: ("number", "i")}
_EnumDP = {1: ("name", "s"), 2: ("value", "m*", _EnumValueDP)}
_OneofDP = {1: ("name", "s")}
_FieldDP = {
    1: ("name", "s"),
    3: ("number", "i"),
    4: ("label", "i"),
    5: ("type", "i"),
    6: ("type_name", "s"),
    9: ("oneof_index", "i"),
    17: ("proto3_optional", "i"),
}
_MessageDP: dict = {
    1: ("name", "s"),
    2: ("field", "m*", _FieldDP),
    4: ("enum_type", "m*", _EnumDP),
    8: ("oneof_decl", "m*", _OneofDP),
}
_MessageDP[3] = ("nested_type", "m*", _MessageDP)  # self-referential
_FileDP = {
    1: ("name", "s"),
    2: ("package", "s"),
    4: ("message_type", "m*", _MessageDP),
    5: ("enum_type", "m*", _EnumDP),
    12: ("syntax", "s"),
}


def _parse_by_schema(buf: bytes, schema: dict) -> dict:
    """Generic wire-format decode into a dict, driven by a bootstrap
    schema. Unknown fields are skipped."""
    out: dict = {}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 7
        spec = schema.get(field_no)
        if spec is None:
            pos = _skip(buf, pos, wire_type)
            continue
        name, kind = spec[0], spec[1]
        repeated = kind.endswith("*")
        kind = kind[0]
        if kind == "i":
            val, pos = read_varint(buf, pos)
            val = _signed(val)
        else:
            n, pos = read_varint(buf, pos)
            end = _bounds(buf, pos, n)
            raw = buf[pos:end]
            pos = end
            if kind == "s":
                val = raw.decode("utf-8")
            elif kind == "b":
                val = bytes(raw)
            else:
                val = _parse_by_schema(raw, spec[2])
        if repeated:
            out.setdefault(name, []).append(val)
        else:
            out[name] = val
    return out


# ------------------------------------------------------- descriptors
class FieldDescriptor:
    __slots__ = ("name", "number", "type", "label", "type_name", "oneof_index", "proto3_optional")

    def __init__(self, d: dict):
        self.name = d.get("name", "")
        self.number = d.get("number", 0)
        self.type = d.get("type", 0)
        self.label = d.get("label", 1)
        self.type_name = d.get("type_name", "")
        self.oneof_index = d.get("oneof_index")
        self.proto3_optional = bool(d.get("proto3_optional", 0))

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    def default(self):
        if self.repeated:
            return []
        if self.type in (T_STRING,):
            return ""
        if self.type == T_BYTES:
            return b""
        if self.type == T_BOOL:
            return False
        if self.type == T_MESSAGE:
            return None
        return 0


class Descriptor:
    """Message descriptor. The generated pb2 module assigns
    ``_serialized_start``/``_serialized_end`` attributes — allowed."""

    def __init__(self, d: dict, full_name: str):
        self.name = d.get("name", "")
        self.full_name = full_name
        self.fields = [FieldDescriptor(f) for f in d.get("field", [])]
        self.oneofs = [o.get("name", "") for o in d.get("oneof_decl", [])]
        self.nested = d.get("nested_type", [])
        self.fields_by_name = {f.name: f for f in self.fields}
        self.fields_by_number = {f.number: f for f in self.fields}
        self._concrete = None  # message class, set by the builder

    def __setattr__(self, k, v):  # permissive: pb2 pokes layout attrs
        object.__setattr__(self, k, v)


class EnumDescriptor:
    def __init__(self, d: dict, full_name: str):
        self.name = d.get("name", "")
        self.full_name = full_name
        self.values = {v.get("name", ""): v.get("number", 0) for v in d.get("value", [])}

    def __setattr__(self, k, v):
        object.__setattr__(self, k, v)


class FileDescriptor:
    def __init__(self, parsed: dict):
        self.name = parsed.get("name", "")
        self.package = parsed.get("package", "")
        self.syntax = parsed.get("syntax", "proto2")
        prefix = "." + self.package + "." if self.package else "."
        self.message_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        for m in parsed.get("message_type", []):
            self._add_message(m, prefix)
        for e in parsed.get("enum_type", []):
            self.enum_types.append(EnumDescriptor(e, prefix + e.get("name", "")))
        self.by_full_name = {d.full_name: d for d in self.message_types}
        self._loaded_options = None

    def _add_message(self, m: dict, prefix: str) -> None:
        full = prefix + m.get("name", "")
        self.message_types.append(Descriptor(m, full))
        for nested in m.get("nested_type", []):
            self._add_message(nested, full + ".")

    def __setattr__(self, k, v):
        object.__setattr__(self, k, v)


def parse_file_descriptor(serialized: bytes) -> FileDescriptor:
    return FileDescriptor(_parse_by_schema(serialized, _FileDP))


# --------------------------------------------------------- messages
class MiniMessage:
    """Base for generated message classes. Subclasses carry DESCRIPTOR."""

    DESCRIPTOR: Descriptor = None  # set by factory

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        # names of singular sub-messages materialized by read access only:
        # they stay "unset" (presence, encoding, equality, WhichOneof)
        # until something effective is written into them, mirroring the
        # real runtime's parent-notifying auto-vivification
        object.__setattr__(self, "_autoviv", set())
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------
    def __getattr__(self, name):
        # only called when not found normally; _values lookups + defaults
        desc = type(self).DESCRIPTOR
        f = desc.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{desc.full_name} has no field {name!r}")
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if f.repeated:
            fresh: list = []
            values[name] = fresh  # persist so appends stick
            return fresh
        if f.type == T_MESSAGE:
            # auto-vivify: persist and hand back the SAME instance so
            # nested in-place mutation (msg.sub.x = 1) is not lost
            inst = _resolve(f)()
            values[name] = inst
            object.__getattribute__(self, "_autoviv").add(name)
            return inst
        return f.default()

    def _effectively_set(self, name: str) -> bool:
        """Presence of an entry in _values, discounting sub-messages that
        were only ever auto-vivified by reads and never written to."""
        if name not in object.__getattribute__(self, "_values"):
            return False
        if name not in object.__getattribute__(self, "_autoviv"):
            return True
        return object.__getattribute__(self, "_values")[name]._has_effective_content()

    def _has_effective_content(self) -> bool:
        values = object.__getattribute__(self, "_values")
        autoviv = object.__getattribute__(self, "_autoviv")
        for name, v in values.items():
            if isinstance(v, list):
                if v:  # read-persisted empty repeated list is not content
                    return True
                continue
            if name not in autoviv:
                return True
            if v._has_effective_content():
                return True
        return False

    def __setattr__(self, name, value):
        desc = type(self).DESCRIPTOR
        f = desc.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{desc.full_name} has no field {name!r}")
        if f.type == T_MESSAGE and not f.repeated and not isinstance(value, MiniMessage):
            raise TypeError(f"{desc.full_name}.{name} expects a message, got {type(value)}")
        if f.type == T_STRING and not f.repeated and not isinstance(value, str):
            raise TypeError(f"{desc.full_name}.{name} expects str")
        values = object.__getattribute__(self, "_values")
        autoviv = object.__getattribute__(self, "_autoviv")
        if f.oneof_index is not None and not f.proto3_optional:
            # setting one arm clears the others of the same oneof
            for other in desc.fields:
                if (
                    other.oneof_index == f.oneof_index
                    and other.name != name
                    and other.name in values
                ):
                    del values[other.name]
                    autoviv.discard(other.name)
        values[name] = value
        autoviv.discard(name)  # explicit assignment is real presence

    def HasField(self, name: str) -> bool:
        f = type(self).DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise ValueError(f"unknown field {name!r}")
        if f.repeated:
            # mirror the real runtime: repeated fields have no presence
            raise ValueError(f'field "{name}" is repeated and has no presence')
        return self._effectively_set(name)

    def WhichOneof(self, oneof_name: str):
        desc = type(self).DESCRIPTOR
        if oneof_name not in desc.oneofs:
            raise ValueError(f"unknown oneof {oneof_name!r}")
        idx = desc.oneofs.index(oneof_name)
        for f in desc.fields:
            if f.oneof_index == idx and self._effectively_set(f.name):
                return f.name
        return None

    # -- wire format --------------------------------------------------
    def SerializeToString(self) -> bytes:
        out = bytearray()
        self._encode(out)
        return bytes(out)

    def _encode(self, out: bytearray) -> None:
        desc = type(self).DESCRIPTOR
        values = object.__getattribute__(self, "_values")
        for f in sorted(desc.fields, key=lambda f: f.number):
            if f.name not in values:
                continue
            if not f.repeated and not self._effectively_set(f.name):
                continue  # read-only auto-vivified sub-message: still unset
            v = values[f.name]
            items = v if f.repeated else [v]
            # explicitly-set fields encode even at default value: valid
            # wire form (receiver decodes to the same default), and for
            # oneof arms / empty sub-messages the tag itself is the signal
            for item in items:
                self._encode_field(out, f, item)

    @staticmethod
    def _encode_field(out: bytearray, f: FieldDescriptor, item) -> None:
        if f.type in _VARINT_TYPES:
            write_varint(out, (f.number << 3) | 0)
            write_varint(out, int(item))
        elif f.type == T_STRING:
            raw = item.encode("utf-8")
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(raw))
            out += raw
        elif f.type == T_BYTES:
            raw = bytes(item)
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(raw))
            out += raw
        elif f.type == T_MESSAGE:
            sub = bytearray()
            item._encode(sub)
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(sub))
            out += sub
        else:
            raise NotImplementedError(f"field type {f.type} not in mini-runtime subset")

    def ParseFromString(self, data: bytes) -> int:
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_autoviv", set())
        self._merge(bytes(data))
        return len(data)

    def _merge(self, buf: bytes) -> None:
        desc = type(self).DESCRIPTOR
        values = object.__getattribute__(self, "_values")
        pos = 0
        while pos < len(buf):
            tag, pos = read_varint(buf, pos)
            field_no, wire_type = tag >> 3, tag & 7
            f = desc.fields_by_number.get(field_no)
            if f is None:
                pos = _skip(buf, pos, wire_type)
                continue
            if f.type in _VARINT_TYPES:
                if wire_type == 2 and f.repeated:
                    # packed repeated varints
                    n, pos = read_varint(buf, pos)
                    end = pos + n
                    while pos < end:
                        raw, pos = read_varint(buf, pos)
                        values.setdefault(f.name, []).append(self._coerce(f, raw))
                    continue
                raw, pos = read_varint(buf, pos)
                val = self._coerce(f, raw)
            elif f.type in _LEN_TYPES:
                n, pos = read_varint(buf, pos)
                end = _bounds(buf, pos, n)
                chunk = buf[pos:end]
                pos = end
                if f.type == T_STRING:
                    val = chunk.decode("utf-8")
                elif f.type == T_BYTES:
                    val = bytes(chunk)
                else:
                    val = _resolve(f)()
                    val._merge(chunk)
            else:
                pos = _skip(buf, pos, wire_type)
                continue
            if f.repeated:
                values.setdefault(f.name, []).append(val)
            else:
                if f.oneof_index is not None and not f.proto3_optional:
                    # proto3 last-wins: wire input carrying two arms of one
                    # oneof must leave only the later arm set, same as the
                    # explicit-assignment path in __setattr__
                    autoviv = object.__getattribute__(self, "_autoviv")
                    for other in desc.fields:
                        if (
                            other.oneof_index == f.oneof_index
                            and other.name != f.name
                            and other.name in values
                        ):
                            del values[other.name]
                            autoviv.discard(other.name)
                values[f.name] = val
                object.__getattribute__(self, "_autoviv").discard(f.name)

    @staticmethod
    def _coerce(f: FieldDescriptor, raw: int):
        if f.type == T_BOOL:
            return bool(raw)
        if f.type in (T_INT32, T_INT64):
            return _signed(raw)
        return raw  # uint32/uint64/enum

    # -- conveniences -------------------------------------------------
    def __repr__(self):
        values = object.__getattribute__(self, "_values")
        inner = ", ".join(f"{k}={v!r}" for k, v in values.items())
        return f"{type(self).__name__}({inner})"

    def _normalized(self) -> dict:
        """Proto3 equality view: plain scalars and repeated fields have
        no presence (explicitly-set default == unset); sub-messages and
        oneof members keep presence."""
        desc = type(self).DESCRIPTOR
        values = object.__getattribute__(self, "_values")
        out = {}
        for name, v in values.items():
            f = desc.fields_by_name[name]
            if not f.repeated and not self._effectively_set(name):
                continue  # auto-vivified-by-read sub-message: unset
            if f.type == T_MESSAGE or f.oneof_index is not None or v != f.default():
                out[name] = v
        return out

    def __eq__(self, other):
        return type(self) is type(other) and self._normalized() == other._normalized()

    def __bool__(self):
        return True


def _resolve(f: FieldDescriptor):
    """Message class for a message-typed field (lazy: classes for all
    types in the file exist once the builder ran)."""
    cls = _MESSAGE_REGISTRY.get(f.type_name)
    if cls is None:
        raise KeyError(f"unresolved message type {f.type_name!r}")
    return cls


#: ".full.name" -> generated class, across all AddSerializedFile calls
_MESSAGE_REGISTRY: dict[str, type] = {}


def build_message_class(desc: Descriptor) -> type:
    cls = type(desc.name, (MiniMessage,), {"DESCRIPTOR": desc})
    desc._concrete = cls
    _MESSAGE_REGISTRY[desc.full_name] = cls
    return cls
