"""Clean-room minimal protobuf runtime (wire format + descriptor subset).

Why: pyspark's ``transformWithStateInPandas`` Python worker talks to the
JVM state server through protobuf messages
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), but this container
has no ``protobuf`` distribution and installing packages is out of scope.
The StateMessage schema is small — proto3, scalar fields (int32/int64/
bool/string/bytes), singular sub-messages, oneofs, ONE enum, repeated
bytes/messages; no maps, no floats, no packed numerics, no extensions —
so the runtime surface the generated module and the pyspark state clients
actually exercise is implementable from the public protocol-buffers
documentation alone:

- wire format: https://protobuf.dev/programming-guides/encoding/
  (varint, length-delimited, tag = field_number << 3 | wire_type)
- descriptor.proto field numbers (FileDescriptorProto et al.): public
  https://github.com/protocolbuffers/protobuf/blob/main/src/google/protobuf/descriptor.proto
- generated-code entry points (descriptor_pool.Default()
  .AddSerializedFile, internal.builder.Build*): observed from the
  generated pb2 module's own calls.

This is NOT a copy of the protobuf library — it is a few hundred lines
implementing exactly the subset above; anything outside it raises.
Everything is property-tested round-trip and tested end-to-end against
the real JVM-side protobuf parser by the transformWithStateInPandas
stream test (tests/test_train_tracker.py).
"""

__version__ = "6.33.0-mini"
