"""Confluent Schema Registry over REAL HTTP (round-7 "What's missing"
item #1): the reference's producers talk to a live registry
(producers/models/producer.py:38-42 `schema.registry.url`), and until
round 8 this repo substituted static schema files — correct wire
bytes, but the HTTP client path a real deployment exercises first was
untested. This module closes that: a stdlib client speaking the
registry's public REST protocol, a stdlib in-process server
implementing the endpoints the clients use, and an executor-side
Arrow decode kernel that resolves writer schemas BY ID over HTTP with
a per-process cache — the actual topology of a Confluent consumer.

Public-protocol surface (documented Confluent REST API):
- POST /subjects/{subject}/versions  body {"schema": "<avro json>"}
  -> {"id": N}; re-registering a canonically-equal schema returns the
  SAME id (registry semantics real producers rely on)
- GET /schemas/ids/{id} -> {"schema": "..."} | 404 {"error_code": 40403}
- GET /subjects -> [names]
- GET /subjects/{subject}/versions/latest -> {subject, version, id, schema}
- Content-Type application/vnd.schemaregistry.v1+json

Scale notes: schema-by-id fetches are once-per-process (the
`_SCHEMA_CACHE` module dict — exactly how the real Java/Python
serializers cache), so a 1000-executor cluster makes ~1000 tiny GETs
per schema version total, not per record. The sim server is
threaded (concurrent executor fetches) and binds an ephemeral
localhost port; in local mode executors share the host, which is the
honest analog of a reachable registry service.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"

#: process-level writer-schema cache: (registry_url, schema_id) -> parsed fields
_SCHEMA_CACHE: dict = {}


def canonical(schema: str | dict) -> str:
    """Canonical schema string (sorted keys, no whitespace) — the
    equality under which registries deduplicate registrations."""
    obj = json.loads(schema) if isinstance(schema, str) else schema
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


class SimSchemaRegistry:
    """In-process Schema Registry speaking the public REST protocol on
    an ephemeral localhost port. Context manager; `.url` is the base."""

    def __init__(self) -> None:
        self._schemas: list[str] = []  # id - 1 -> canonical schema
        self._by_canon: dict[str, int] = {}
        self._subjects: dict[str, list[int]] = {}  # subject -> [ids]
        self._lock = threading.Lock()
        reg = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                with reg._lock:
                    if parts[:2] == ["schemas", "ids"] and len(parts) == 3:
                        sid = int(parts[2])
                        if 1 <= sid <= len(reg._schemas):
                            return self._send(200, {"schema": reg._schemas[sid - 1]})
                        return self._send(
                            404, {"error_code": 40403, "message": "Schema not found"}
                        )
                    if parts == ["subjects"]:
                        return self._send(200, sorted(reg._subjects))
                    if (
                        len(parts) == 4
                        and parts[0] == "subjects"
                        and parts[2] == "versions"
                        and parts[3] == "latest"
                    ):
                        ids = reg._subjects.get(parts[1])
                        if not ids:
                            return self._send(
                                404,
                                {"error_code": 40401, "message": "Subject not found"},
                            )
                        return self._send(
                            200,
                            {
                                "subject": parts[1],
                                "version": len(ids),
                                "id": ids[-1],
                                "schema": reg._schemas[ids[-1] - 1],
                            },
                        )
                return self._send(404, {"error_code": 404, "message": "not found"})

            def do_POST(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n))
                    schema = canonical(payload["schema"])
                except Exception:
                    return self._send(
                        422, {"error_code": 42201, "message": "Invalid schema"}
                    )
                if (
                    len(parts) == 3
                    and parts[0] == "subjects"
                    and parts[2] == "versions"
                ):
                    with reg._lock:
                        sid = reg._by_canon.get(schema)
                        if sid is None:
                            reg._schemas.append(schema)
                            sid = len(reg._schemas)
                            reg._by_canon[schema] = sid
                        versions = reg._subjects.setdefault(parts[1], [])
                        if sid not in versions:
                            versions.append(sid)
                    return self._send(200, {"id": sid})
                return self._send(404, {"error_code": 404, "message": "not found"})

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "SimSchemaRegistry":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "SimSchemaRegistry":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class SchemaRegistryClient:
    """Minimal registry client over urllib — the code path a producer/
    consumer exercises against a real registry (same REST verbs, same
    content type, same error mapping)."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")

    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        import urllib.error
        import urllib.request

        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.base_url + path,
            data=data,
            method=method,
            headers={"Content-Type": CONTENT_TYPE},
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:  # surface the registry error body
            detail = e.read().decode(errors="replace")[:200]
            raise RuntimeError(f"registry {method} {path} -> {e.code}: {detail}") from e

    def register(self, subject: str, schema: str | dict) -> int:
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": canonical(schema)},
        )
        return int(out["id"])

    def get_by_id(self, schema_id: int) -> str:
        return self._request("GET", f"/schemas/ids/{schema_id}")["schema"]

    def get_latest(self, subject: str) -> dict:
        return self._request("GET", f"/subjects/{subject}/versions/latest")


def _cached_fields(registry_url: str, schema_id: int):
    """Executor-side writer-schema resolution with the per-process
    cache real serializers use."""
    from . import avro_codec

    key = (registry_url, schema_id)
    if key not in _SCHEMA_CACHE:
        schema = SchemaRegistryClient(registry_url).get_by_id(schema_id)
        _SCHEMA_CACHE[key] = avro_codec._parse_schema(schema)
    return _SCHEMA_CACHE[key]


def registry_decode_confluent_avro(df, registry_url: str, out_ddl: str):
    """Decode Confluent-framed Avro `value` bytes with the WRITER
    schema fetched from the registry BY the frame's schema id — the
    real consumer topology (no static schema file anywhere). ``out_ddl``
    declares the projected columns (a reader view; every named field
    must exist in the writer schema). Arrow-batched mapInPandas; HTTP
    cost is once per (process, schema id) via the module cache."""
    import pandas as pd

    from . import avro_codec

    names = [f.split()[0] for f in out_ddl.split(",")]

    def batches(it):
        for pdf in it:
            out = {n: [] for n in names}
            for buf in pdf["value"]:
                sid, payload = avro_codec.strip_confluent_frame(bytes(buf))
                fields = _cached_fields(registry_url, sid)
                rec = avro_codec.decode_record(payload, fields)
                for n in names:
                    out[n].append(rec[n])
            yield pd.DataFrame(out)

    return df.select("value").mapInPandas(batches, out_ddl)
