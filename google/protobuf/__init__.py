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

def _adopt_real_runtime() -> bool:
    """If a real protobuf distribution is importable elsewhere on
    google.__path__ (extend_path appends it in google/__init__.py),
    load it in place of this shim so the mini-runtime only ever fills
    the gap. Returns True when the swap happened."""
    import importlib.util
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    shim = sys.modules[__name__]
    try:
        import google

        for entry in list(getattr(google, "__path__", [])):
            pkg_dir = os.path.join(entry, "protobuf")
            init_py = os.path.join(pkg_dir, "__init__.py")
            if os.path.abspath(pkg_dir) == here or not os.path.isfile(init_py):
                continue
            spec = importlib.util.spec_from_file_location(
                __name__, init_py, submodule_search_locations=[pkg_dir]
            )
            mod = importlib.util.module_from_spec(spec)
            # self-replacement during exec is supported by importlib: the
            # import machinery rebinds from sys.modules after this module
            # body finishes
            sys.modules[__name__] = mod
            spec.loader.exec_module(mod)
            return True
    except Exception:  # pragma: no cover - fall back to the shim
        sys.modules[__name__] = shim
    return False


if not _adopt_real_runtime():
    __version__ = "6.33.0-mini"
