"""Simulated Kafka broker as a PySpark Python Data Source (DSv2).

The reference runtime consumes a LIVE Kafka cluster
(reference: docker-compose.yaml:12-141, consumers/consumer.py:47-99);
this sandbox has no broker, and until now the engine substituted plain
file sources with golden wire frames — semantically equivalent but
without real offset mechanics. This module closes that gap inside the
sandbox: a broker-log directory layout plus a registered Spark data
source ("kafkasim") that serves it through Spark's own source API with
the SAME surface a real Kafka source exposes:

- the Kafka source schema: key/value binary, topic, partition, offset,
  timestamp, timestampType — downstream decode (strip_confluent_header,
  decode_confluent_avro, decode_json_value) is byte-for-byte the code
  path a live broker would feed;
- `subscribe` (comma list) and `subscribePattern` (regex fan-in, S7);
- `startingOffsets` earliest / latest / per-partition JSON (S8);
- streaming micro-batches with true offset tracking: resume from a
  checkpoint consumes exactly-once from the committed offset (X1), and
  `maxRecordsPerTrigger` caps per-partition batch advance (X5
  back-pressure), like the real source's maxOffsetsPerTrigger.

Broker-log layout (append-only, Kafka-segment style):

    {log_dir}/{topic}/{partition:04d}/{base_offset:012d}.parquet

Each segment holds consecutive records (columns: key binary nullable,
value binary, ts_ms int64) starting at the base offset encoded in its
filename; a partition's end offset is the last segment's base + rows.
Appends create new segments, never rewrite — offsets are stable, so a
re-read at a given offset range is deterministic (the property every
delivery-semantics test leans on).

Partitioner: explicit partition wins; else crc32(key) % n; else
round-robin. (Kafka proper uses murmur2 for keyed records — crc32 is a
deliberate simplification; tests pin placement via explicit partitions
when they care.)

Everything here is built only on the public pyspark.sql.datasource API
and pyarrow.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import zlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)
_SEG_RE = re.compile(r"^(\d{12})\.parquet$")


# --------------------------------------------------------------- broker log


class SimBroker:
    """Producer/admin half: an append-only segmented broker log."""

    def __init__(self, log_dir: str, default_partitions: int = 3):
        self.log_dir = log_dir
        self.default_partitions = default_partitions
        os.makedirs(log_dir, exist_ok=True)

    # -- admin -------------------------------------------------------------
    def create_topic(self, topic: str, n_partitions: int | None = None) -> None:
        n = n_partitions or self.default_partitions
        for p in range(n):
            os.makedirs(os.path.join(self.log_dir, topic, f"{p:04d}"), exist_ok=True)

    def topics(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.log_dir)
            if not d.startswith(".") and os.path.isdir(os.path.join(self.log_dir, d))
        )

    def n_partitions(self, topic: str) -> int:
        tdir = os.path.join(self.log_dir, topic)
        return len([d for d in os.listdir(tdir) if d.isdigit()])

    def end_offsets(self, topic: str) -> dict[int, int]:
        return {
            p: _segment_end(os.path.join(self.log_dir, topic, f"{p:04d}"))
            for p in range(self.n_partitions(topic))
        }

    # -- produce -----------------------------------------------------------
    def produce(
        self,
        topic: str,
        records: list[tuple[bytes | None, bytes, int]],
        partition: int | None = None,
    ) -> None:
        """Append (key, value, ts_ms) records. Explicit partition wins;
        keyed records hash-partition; unkeyed round-robin."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if topic not in self.topics():
            self.create_topic(topic)
        n = self.n_partitions(topic)
        per_part: dict[int, list] = {}
        for i, (k, v, ts) in enumerate(records):
            if partition is not None:
                p = partition
            elif k is not None:
                p = zlib.crc32(k) % n
            else:
                p = i % n
            per_part.setdefault(p, []).append((k, v, ts))
        for p, rows in per_part.items():
            pdir = os.path.join(self.log_dir, topic, f"{p:04d}")
            base = _segment_end(pdir)
            tbl = pa.table(
                {
                    "key": pa.array([r[0] for r in rows], pa.binary()),
                    "value": pa.array([r[1] for r in rows], pa.binary()),
                    "ts_ms": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
            pq.write_table(tbl, os.path.join(pdir, f"{base:012d}.parquet"))


def _segments(pdir: str) -> list[tuple[int, str, int]]:
    """[(base_offset, path, n_rows)] sorted by base offset."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(pdir)):
        m = _SEG_RE.match(f)
        if m:
            path = os.path.join(pdir, f)
            out.append((int(m.group(1)), path, pq.read_metadata(path).num_rows))
    return out


def _segment_end(pdir: str) -> int:
    segs = _segments(pdir)
    return segs[-1][0] + segs[-1][2] if segs else 0


# ------------------------------------------------------------- source side


@dataclass
class _Slice(InputPartition):
    topic: str
    partition: int
    pdir: str
    start: int
    end: int


def _read_slice(s: _Slice):
    """Yield Kafka-schema tuples for offsets [start, end) of one
    topic-partition — executor-side, touching only overlapping segments."""
    import pyarrow.parquet as pq

    for base, path, n in _segments(s.pdir):
        if base + n <= s.start or base >= s.end:
            continue
        tbl = pq.read_table(path)
        keys, vals, tss = (
            tbl.column("key").to_pylist(),
            tbl.column("value").to_pylist(),
            tbl.column("ts_ms").to_pylist(),
        )
        lo = max(s.start - base, 0)
        hi = min(s.end - base, n)
        for i in range(lo, hi):
            yield (
                keys[i],
                vals[i],
                s.topic,
                s.partition,
                base + i,
                _dt.datetime.fromtimestamp(tss[i] / 1000.0, tz=_dt.timezone.utc),
                0,  # CreateTime, like the real source
            )


def _selected_topics(log_dir: str, options: dict) -> list[str]:
    topics = sorted(
        d for d in os.listdir(log_dir)
        if not d.startswith(".") and os.path.isdir(os.path.join(log_dir, d))
    )
    if options.get("subscribe"):
        want = {t.strip() for t in options["subscribe"].split(",")}
        missing = want - set(topics)
        if missing:
            raise ValueError(f"kafkasim: unknown topics {sorted(missing)}")
        return sorted(want)
    if options.get("subscribepattern"):
        pat = re.compile(options["subscribepattern"])
        return [t for t in topics if pat.fullmatch(t)]
    return topics


def _disk_offsets(log_dir: str, topics: list[str]) -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    for t in topics:
        tdir = os.path.join(log_dir, t)
        out[t] = {
            d.lstrip("0") or "0": _segment_end(os.path.join(tdir, d))
            for d in sorted(os.listdir(tdir))
            if d.isdigit()
        }
    return out


def _starting_offsets(
    log_dir: str, topics: list[str], options: dict
) -> dict[str, dict[str, int]]:
    mode = options.get("startingoffsets", "earliest")
    if mode == "earliest":
        return {
            t: {p: 0 for p in _disk_offsets(log_dir, [t])[t]} for t in topics
        }
    if mode == "latest":
        return _disk_offsets(log_dir, topics)
    spec = json.loads(mode)  # {"topic": {"0": 5, ...}} — -2 earliest, -1 latest
    out: dict[str, dict[str, int]] = {}
    for t in topics:
        disk = _disk_offsets(log_dir, [t])[t]
        out[t] = {}
        for p, end in disk.items():
            o = spec.get(t, {}).get(p, -2)
            out[t][p] = end if o == -1 else 0 if o == -2 else int(o)
    return out


class KafkaSimBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.log_dir = options.get("path") or options["log.dir"]
        self.options = options

    def partitions(self):
        topics = _selected_topics(self.log_dir, self.options)
        start = _starting_offsets(self.log_dir, topics, self.options)
        end_opt = self.options.get("endingoffsets", "latest")
        disk = _disk_offsets(self.log_dir, topics)
        if end_opt == "latest":
            end = disk
        else:
            spec = json.loads(end_opt)
            end = {
                t: {
                    p: disk[t][p] if spec.get(t, {}).get(p, -1) == -1
                    else int(spec[t][p])
                    for p in disk[t]
                }
                for t in topics
            }
        return [
            _Slice(t, int(p), os.path.join(self.log_dir, t, f"{int(p):04d}"),
                   start[t][p], end[t][p])
            for t in topics
            for p in disk[t]
            if end[t][p] > start[t][p]
        ]

    def read(self, partition: _Slice):
        return _read_slice(partition)


class KafkaSimStreamReader(DataSourceStreamReader):
    """Micro-batch reader with real offset bookkeeping: the offset dict
    {topic: {partition: next_offset}} round-trips through Spark's
    checkpoint, so a restarted query resumes exactly where the last
    committed batch ended.

    Back-pressure (`maxRecordsPerTrigger`) caps how far each partition
    advances per `latestOffset` call. The python stream API does not
    pass the batch start into latestOffset, so the ramp base is
    tracked: in memory between calls, floored by the starts Spark
    hands to `partitions()` (authoritative — they come from the
    checkpoint), and persisted at `commit()` under
    `{log_dir}/.reader_state/{groupId}.json` so a RESTARTED capped
    query resumes its ramp at the committed offset instead of behind
    the checkpoint (which would plan an end < start batch). Set a
    distinct `groupId` option per concurrent capped query on the same
    log, like Kafka's group.id."""

    def __init__(self, options: dict):
        self.log_dir = options.get("path") or options["log.dir"]
        self.options = options
        self.max_per_trigger = int(options.get("maxrecordspertrigger", 0)) or None
        self._state_path = os.path.join(
            self.log_dir, ".reader_state",
            f"{options.get('groupid', 'default')}.json",
        )
        self._last_end = None
        if self.max_per_trigger is not None and os.path.exists(self._state_path):
            try:
                with open(self._state_path) as f:
                    self._last_end = json.load(f)
            except (OSError, json.JSONDecodeError):
                self._last_end = None

    def initialOffset(self) -> dict:
        topics = _selected_topics(self.log_dir, self.options)
        return _starting_offsets(self.log_dir, topics, self.options)

    @staticmethod
    def _floor(base: dict, other: dict) -> dict:
        """Per-partition max of two offset dicts (monotonicity floor)."""
        out = {t: dict(ps) for t, ps in base.items()}
        for t, ps in (other or {}).items():
            for p, o in ps.items():
                out.setdefault(t, {})[p] = max(out.get(t, {}).get(p, 0), int(o))
        return out

    def latestOffset(self) -> dict:
        topics = _selected_topics(self.log_dir, self.options)
        disk = _disk_offsets(self.log_dir, topics)
        if self.max_per_trigger is None:
            return disk
        base = self._floor(self.initialOffset(), self._last_end)
        capped = {
            t: {
                p: min(disk[t][p], base.get(t, {}).get(p, 0) + self.max_per_trigger)
                for p in disk[t]
            }
            for t in topics
        }
        # never behind what we already handed out (offsets are monotone)
        capped = self._floor(capped, self._last_end)
        self._last_end = capped
        return capped

    def partitions(self, start: dict, end: dict):
        if self.max_per_trigger is not None:
            # the checkpointed start is authoritative: floor the ramp so
            # a restart never plans an end behind the committed offset
            self._last_end = self._floor(self._last_end or {}, start)
        return [
            _Slice(t, int(p), os.path.join(self.log_dir, t, f"{int(p):04d}"),
                   start.get(t, {}).get(p, 0), end[t][p])
            for t in end
            for p in end[t]
            if end[t][p] > start.get(t, {}).get(p, 0)
        ]

    def read(self, partition: _Slice):
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # append-only log: nothing to release; persist the ramp base so
        # a restarted capped query resumes at the committed offset
        if self.max_per_trigger is not None:
            os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
            tmp = self._state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(end, f)
            os.replace(tmp, self._state_path)


class KafkaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkasim"

    def schema(self) -> str:
        return SCHEMA

    def _norm_options(self) -> dict:
        return {k.lower(): v for k, v in self.options.items()}

    def reader(self, schema) -> DataSourceReader:
        return KafkaSimBatchReader(self._norm_options())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return KafkaSimStreamReader(self._norm_options())


def register(spark) -> None:
    """Idempotent per-session registration of the kafkasim format."""
    spark.dataSource.register(KafkaSimDataSource)


def foreach_batch_producer(log_dir: str, topic: str):
    """K1 write path: a foreachBatch function producing each micro-batch
    onto a broker topic. Expects columns `key` (binary, nullable),
    `value` (binary) and optionally `timestamp` (timestamp) — the same
    contract as the real Kafka sink. Records land in one new segment
    per (batch, partition): append-only, offsets assigned by the log,
    exactly like a producer send.

    The collect is per micro-batch — the sink-side mirror of the real
    producer's bounded send buffer. (A real cluster writes from
    executors via foreachPartition; a single-directory broker log needs
    single-writer appends, which the driver-side batch hook provides.)"""

    def _produce(df, _epoch_id: int) -> None:
        cols = set(df.columns)
        rows = df.collect()
        if not rows:
            return
        broker = SimBroker(log_dir)
        broker.produce(
            topic,
            [
                (
                    bytes(r.key) if "key" in cols and r.key is not None else None,
                    bytes(r.value),
                    int(r.timestamp.timestamp() * 1000) if "timestamp" in cols else 0,
                )
                for r in rows
            ],
        )

    return _produce
