"""WARC (Web ARChive) source as a PySpark Python Data Source.

WARC is the interchange format LLM text corpora actually arrive in
(Common Crawl ships WARC/WET). This module implements, clean-room from
the PUBLIC ISO 28500 format description (version line, CRLF-separated
named header fields, Content-Length octet framing, double-CRLF record
terminator):

- a DISTRIBUTED writer: ``write_warc_shards`` serializes a DataFrame
  into n_shards .warc files from executors via ``mapInPandas`` (the
  driver never sees a record) and returns a per-shard manifest;
- a registered Spark data source ("warcsim") whose batch reader lists
  one input partition PER FILE — the same parallelism contract a real
  WARC reader over an object store has — and parses records by
  Content-Length framing (payload bytes are NEVER scanned for
  delimiters, so arbitrary binary payloads round-trip).

Only public APIs: pyspark.sql.datasource, pyarrow.

Filesystem contract: ``write_warc_shards`` writes shard files at
executor-local paths and the "warcsim" reader opens them by path on
executors, so the pair only round-trips when driver and executors see
ONE shared filesystem — true in local mode (how every tempdir-based
sim in this repo runs) and on clusters whose ``out_dir`` is a shared
mount or fuse-mounted object store. On a cluster with executor-local
disks, point ``out_dir`` at shared storage; the returned manifest is
driver-collected and validated against the directory listing so a
violated assumption fails loudly at write time, not as silent reader
truncation.

Scale notes: each .warc file streams through exactly one task with
O(record) memory (the parser never materializes a whole file); shard
count controls parallelism exactly like parquet file count. Headers
surface as a map column so format evolution (new X- fields) never
breaks the schema.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "content_length bigint, headers map<string,string>, payload binary"
)

_CRLF = b"\r\n"


def format_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, header fields, blank line,
    Content-Length payload octets, double-CRLF terminator."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def parse_records(blob: bytes):
    """Yield (headers dict, payload bytes) from concatenated WARC
    records. Content-Length framing only — payload bytes are opaque."""
    pos, n = 0, len(blob)
    while pos < n:
        head_end = blob.index(_CRLF + _CRLF, pos)
        head = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        payload = blob[body_start : body_start + clen]
        yield headers, payload
        pos = body_start + clen + 4  # skip record terminator


def write_warc_shards(df, out_dir: str, n_shards: int = 4):
    """Distributed WARC writer: every executor partition serializes its
    rows into one shard file; returns the collected manifest
    [(shard_path, n_records, n_bytes)]. Input columns: doc_id, text,
    lang, source."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n_rec = n_bytes = 0
        with open(path, "wb") as fh:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    payload = str(r.text).encode()
                    rec = format_record(
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{int(r.doc_id)}>",
                            "WARC-Target-URI": f"http://example.com/doc/{int(r.doc_id)}",
                            "X-Graft-Lang": str(r.lang),
                            "X-Graft-Source": str(r.source),
                        },
                        payload,
                    )
                    fh.write(rec)
                    n_rec += 1
                    n_bytes += len(rec)
        yield pd.DataFrame(
            {"shard": [path], "n_records": [n_rec], "n_bytes": [n_bytes]}
        )

    manifest = (
        df.select("doc_id", "text", "lang", "source")
        .repartition(n_shards, "doc_id")
        .mapInPandas(write_part, "shard string, n_records long, n_bytes long")
        .collect()
    )
    # shared-filesystem contract check (module docstring): every
    # executor-written shard must be visible from the driver, else the
    # reader would silently see a truncated corpus
    missing = [r.shard for r in manifest if not os.path.exists(r.shard)]
    if missing:
        raise FileNotFoundError(
            "WARC shards written on executors are not visible from the "
            f"driver (out_dir must be shared storage): {missing[:3]}"
        )
    return manifest


class _WarcFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".warc")
        )
        return [_WarcFile(p) for p in files]

    def read(self, partition: _WarcFile):
        # incremental parse: the buffer holds at most one partial record
        # plus one read chunk — O(record) memory however large the shard
        buf = b""
        with open(partition.path, "rb") as fh:
            while True:
                chunk = fh.read(1 << 20)
                if chunk:
                    buf += chunk
                at_eof = not chunk
                while True:
                    head_end = buf.find(_CRLF + _CRLF)
                    if head_end < 0:
                        break
                    head = buf[:head_end].decode("utf-8", errors="replace")
                    lines = head.split("\r\n")
                    if not lines[0].startswith("WARC/"):
                        raise ValueError(f"bad WARC version line: {lines[0]!r}")
                    headers = {}
                    for line in lines[1:]:
                        k, _, v = line.partition(":")
                        headers[k.strip()] = v.strip()
                    clen = int(headers["Content-Length"])
                    rec_end = head_end + 4 + clen + 4
                    if len(buf) < rec_end:
                        break  # payload not fully buffered yet
                    payload = buf[head_end + 4 : head_end + 4 + clen]
                    buf = buf[rec_end:]
                    yield (
                        headers.get("WARC-Record-ID", ""),
                        headers.get("WARC-Type", ""),
                        headers.get("WARC-Target-URI", ""),
                        clen,
                        headers,
                        payload,
                    )
                if at_eof:
                    if buf.strip(b"\r\n"):
                        raise ValueError(
                            f"truncated WARC record at end of {partition.path}"
                        )
                    return


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcsim"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcBatchReader({k.lower(): v for k, v in self.options.items()})


def register(spark) -> None:
    """Idempotent per-session registration of the warcsim format."""
    spark.dataSource.register(WarcDataSource)
