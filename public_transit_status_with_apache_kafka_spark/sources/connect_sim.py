"""Kafka Connect REST shim (round-7 "What's missing" item #1, second
half): the reference configures a live Kafka Connect JDBC source over
HTTP (producers/connector.py:14-52 — GET /connectors/{name}, then POST
/connectors with the JdbcSourceConnector config, raise_for_status).
This module provides that REST surface in-process (stdlib
ThreadingHTTPServer) wired to the engine's incrementing poller
(sources/incremental.py — the same mode=incrementing / batch.max.rows
semantics the JDBC connector pushes to the database), publishing
polled rows as JSON onto the simulated broker topic
``{topic.prefix}{table}`` exactly like the reference's stations flow.

The REST protocol implemented is the public Kafka Connect API subset
the reference (and standard tooling) uses:
- GET  /connectors                -> [names]
- GET  /connectors/{name}         -> {name, config, tasks, type} | 404
- POST /connectors                -> 201 {name, config, ...} | 409 if exists
- GET  /connectors/{name}/status  -> {name, connector: {state: RUNNING}, tasks}
- DELETE /connectors/{name}       -> 204

``configure_connector`` is the client twin of the reference's
GET-then-POST idempotent flow, over urllib. Polling is exposed as
``poll_once(name)`` (deterministic for tests; a real worker's
poll.interval.ms loop is just this in a timer) — each poll reads ONLY
rows past the high-water mark with the predicate pushed into the scan,
caps at batch.max.rows, and produces one JSON message per row keyed by
the incrementing column, so at-least-once delivery and server-side
filtering match the real connector's contract.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_REQUIRED = {
    "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
    "mode": "incrementing",
}
_REQUIRED_KEYS = (
    "incrementing.column.name",
    "topic.prefix",
    "table.whitelist",
    "batch.max.rows",
)


class SimKafkaConnect:
    """In-process Kafka Connect worker: REST on an ephemeral localhost
    port; ``tables`` maps table name -> zero-arg read_fn returning the
    current table DataFrame (the JDBC-connection stand-in); polled rows
    publish to ``broker`` (sources/kafka_sim.SimBroker)."""

    def __init__(self, broker, tables: dict) -> None:
        self._broker = broker
        self._tables = tables
        self._connectors: dict[str, dict] = {}  # name -> {config, poller}
        self._lock = threading.Lock()
        conn = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code: int, obj=None) -> None:
                body = b"" if obj is None else json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_GET(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                with conn._lock:
                    if parts == ["connectors"]:
                        return self._send(200, sorted(conn._connectors))
                    if len(parts) == 2 and parts[0] == "connectors":
                        c = conn._connectors.get(parts[1])
                        if c is None:
                            return self._send(
                                404,
                                {"error_code": 404,
                                 "message": f"Connector {parts[1]} not found"},
                            )
                        return self._send(
                            200,
                            {"name": parts[1], "config": c["config"],
                             "tasks": [{"connector": parts[1], "task": 0}],
                             "type": "source"},
                        )
                    if (
                        len(parts) == 3
                        and parts[0] == "connectors"
                        and parts[2] == "status"
                    ):
                        if parts[1] not in conn._connectors:
                            return self._send(
                                404, {"error_code": 404, "message": "not found"}
                            )
                        return self._send(
                            200,
                            {"name": parts[1],
                             "connector": {"state": "RUNNING",
                                           "worker_id": "sim:0"},
                             "tasks": [{"id": 0, "state": "RUNNING",
                                        "worker_id": "sim:0"}],
                             "type": "source"},
                        )
                return self._send(404, {"error_code": 404, "message": "not found"})

            def do_POST(self) -> None:
                if self.path.rstrip("/") != "/connectors":
                    return self._send(404, {"error_code": 404, "message": "not found"})
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n))
                    name, config = payload["name"], dict(payload["config"])
                except Exception:
                    return self._send(
                        400, {"error_code": 400, "message": "bad request body"}
                    )
                err = conn._validate(config)
                if err:
                    return self._send(400, {"error_code": 400, "message": err})
                with conn._lock:
                    if name in conn._connectors:
                        return self._send(
                            409,
                            {"error_code": 409,
                             "message": f"Connector {name} already exists"},
                        )
                    conn._create(name, config)
                return self._send(
                    201,
                    {"name": name, "config": config, "tasks": [], "type": "source"},
                )

            def do_DELETE(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                if len(parts) == 2 and parts[0] == "connectors":
                    with conn._lock:
                        if conn._connectors.pop(parts[1], None) is not None:
                            return self._send(204)
                return self._send(404, {"error_code": 404, "message": "not found"})

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def _validate(self, config: dict) -> str | None:
        for k, v in _REQUIRED.items():
            if config.get(k) != v:
                return f"unsupported {k}: {config.get(k)!r} (need {v!r})"
        for k in _REQUIRED_KEYS:
            if k not in config:
                return f"missing required config {k}"
        table = config["table.whitelist"]
        if table not in self._tables:
            return f"table {table!r} not reachable via connection.url"
        return None

    def _create(self, name: str, config: dict) -> None:
        from .incremental import IncrementingPoller

        table = config["table.whitelist"]
        self._connectors[name] = {
            "config": config,
            "poller": IncrementingPoller(
                self._tables[table],
                config["incrementing.column.name"],
                batch_max_rows=int(config["batch.max.rows"]),
            ),
        }

    def poll_once(self, name: str) -> int:
        """One connector poll cycle: new rows past the mark -> one JSON
        message each onto {topic.prefix}{table}, keyed by the
        incrementing column. Returns the delivered row count."""
        with self._lock:
            c = self._connectors[name]
        config, poller = c["config"], c["poller"]
        topic = config["topic.prefix"] + config["table.whitelist"]
        inc_col = config["incrementing.column.name"]
        batch = poller.poll()
        rows = [r.asDict() for r in batch.collect()]
        poller.release()
        if rows:
            self._broker.produce(
                topic,
                [
                    (
                        str(r[inc_col]).encode(),
                        json.dumps(r, default=str).encode(),
                        0,
                    )
                    for r in rows
                ],
            )
        return len(rows)

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "SimKafkaConnect":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "SimKafkaConnect":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def configure_connector(base_url: str, name: str, config: dict) -> bool:
    """The reference's idempotent GET-then-POST flow
    (producers/connector.py:18-52) over urllib: returns False when the
    connector already exists (skip), True when created; raises on any
    error status like requests' raise_for_status."""
    import urllib.error
    import urllib.request

    base = base_url.rstrip("/")
    try:
        with urllib.request.urlopen(f"{base}/connectors/{name}", timeout=10):
            return False  # 200: already created, skip recreation
    except urllib.error.HTTPError as e:
        if e.code != 404:
            raise RuntimeError(f"connect GET -> {e.code}") from e
    req = urllib.request.Request(
        f"{base}/connectors",
        data=json.dumps({"name": name, "config": config}).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=10):
            return True
    except urllib.error.HTTPError as e:
        detail = e.read().decode(errors="replace")[:200]
        raise RuntimeError(f"connect POST -> {e.code}: {detail}") from e
