"""K2: Kafka REST Proxy sink (offline payload construction).

The reference's weather producer publishes via Confluent REST Proxy
instead of a native Kafka client (producers/models/weather.py:70-88):
it POSTs to ``{rest_proxy_url}/topics/{topic}`` with header
``Content-Type: application/vnd.kafka.avro.v2+json`` and body

    {"key_schema": "<json string>", "value_schema": "<json string>",
     "records": [{"key": {...}, "value": {...}}, ...]}

Spark-first re-expression: the per-record ``{"key":…,"value":…}``
fragments are built JVM-side with ``to_json(struct(...))`` (codegen,
no Python in the row path); envelope assembly chunks each partition
locally into bounded POST bodies with an Arrow-batched ``mapInPandas``
— no shuffle, so at 100 TB every executor ships its own partitions to
the proxy in parallel, exactly how a distributed HTTP sink should fan
out. The HTTP POST itself is a per-batch side effect and belongs in
``foreachBatch`` / ``foreachPartition``; it is isolated in
``post_partition`` behind an import guard so the payload logic stays
testable offline.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REST_PROXY_CONTENT_TYPE = "application/vnd.kafka.avro.v2+json"


def record_json(df: DataFrame, key_cols: List[str], value_cols: List[str]) -> DataFrame:
    """One REST-proxy record fragment per row, built entirely JVM-side:
    ``{"key": {<key_cols>}, "value": {<value_cols>}}``."""
    key = F.to_json(F.struct(*[F.col(c) for c in key_cols]))
    value = F.to_json(F.struct(*[F.col(c) for c in value_cols]))
    return df.select(
        F.concat(
            F.lit('{"key": '), key, F.lit(', "value": '), value, F.lit("}")
        ).alias("record")
    )


def envelope(records: Iterable[str], key_schema: dict, value_schema: dict) -> str:
    """Assemble one POST body from pre-rendered record fragments.

    Mirrors producers/models/weather.py:74-83: the schemas are embedded
    as JSON *strings* (double-encoded), records as objects.
    """
    return (
        '{"key_schema": %s, "value_schema": %s, "records": [%s]}'
        % (
            json.dumps(json.dumps(key_schema)),
            json.dumps(json.dumps(value_schema)),
            ", ".join(records),
        )
    )


def post_bodies(
    df: DataFrame,
    key_cols: List[str],
    value_cols: List[str],
    key_schema: dict,
    value_schema: dict,
    batch_size: int = 500,
) -> DataFrame:
    """DataFrame of complete REST-proxy POST bodies, each covering at
    most ``batch_size`` records. Chunking is per input partition (local,
    no shuffle); the last chunk of each partition may be short."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: List[str] = []
        for pdf in batches:
            for rec in pdf["record"]:
                buf.append(rec)
                if len(buf) >= batch_size:
                    yield pd.DataFrame(
                        {"body": [envelope(buf, key_schema, value_schema)]}
                    )
                    buf = []
        if buf:
            yield pd.DataFrame({"body": [envelope(buf, key_schema, value_schema)]})

    return record_json(df, key_cols, value_cols).mapInPandas(
        chunk, schema="body string"
    )


def post_partition(bodies: Iterable[str], url: str, topic: str) -> int:
    """Side-effecting half of the sink: POST each body to
    ``{url}/topics/{topic}``. For use inside ``foreachPartition`` /
    ``foreachBatch``. Returns the number of successful posts. Gated on
    ``requests`` availability (not needed for offline tests)."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - container has no requests
        raise NotImplementedError(
            "HTTP posting requires the 'requests' package"
        ) from exc
    sent = 0
    for body in bodies:
        resp = requests.post(
            url=f"{url}/topics/{topic}",
            headers={"Content-Type": REST_PROXY_CONTENT_TYPE},
            data=body,
        )
        resp.raise_for_status()
        sent += 1
    return sent
