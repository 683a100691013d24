"""Incrementing-column polling source (SURVEY.md S3).

The reference snapshots Postgres `stations` into Kafka with Kafka
Connect JDBC in `mode=incrementing` on `stop_id`: each poll reads only
rows with stop_id greater than the last seen maximum
(producers/connector.py:26-48 — `WHERE stop_id > ?` pushed to the
server, batch.max.rows=500, poll every 60 s).

Structured Streaming has no native JDBC source, so the engine models the
same semantics as a generic poller over any batch-readable source: a
`read_fn` producing the current table DataFrame, an incrementing column,
and a persistent high-water mark. Each `poll()` returns only new rows —
with the predicate *pushed into the scan* (for JDBC that becomes the
server-side WHERE; for parquet it's a PushedFilters row-group skip) —
and advances the mark. `batch_max_rows` caps a poll like the
connector's `batch.max.rows` (X5 back-pressure).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementingPoller:
    """Stateful high-water-mark poller (one instance per subscription).

    At 100 TB this state lives in a checkpoint table, not driver memory;
    the single-value mark makes that a trivial one-row upsert."""

    def __init__(
        self,
        read_fn: Callable[[], DataFrame],
        incrementing_col: str,
        batch_max_rows: int | None = None,
    ) -> None:
        self._read_fn = read_fn
        self._col = incrementing_col
        self._batch_max_rows = batch_max_rows
        self._mark: int | None = None
        self._prev_batch: DataFrame | None = None

    @property
    def mark(self) -> int | None:
        return self._mark

    def poll(self) -> DataFrame:
        """Rows with incrementing_col > mark, ordered, capped; advances
        the mark to the max delivered value.

        The filter is applied BEFORE any limit so the predicate reaches
        the scan; the limit-then-max is computed on the capped batch so
        an interrupted poll never skips rows (at-least-once, exactly the
        connector's contract).

        Each poll caches its batch (the mark computation and the
        caller's consumption share one materialization) and releases
        the PREVIOUS poll's cache — a long-lived poller holds at most
        one batch of storage. Call :meth:`release` (or use the poller
        as a context manager) when done with the final batch."""
        self.release()
        df = self._read_fn()
        if self._mark is not None:
            df = df.filter(F.col(self._col) > self._mark)
        df = df.orderBy(self._col)
        if self._batch_max_rows is not None:
            df = df.limit(self._batch_max_rows)
        batch = df.cache()
        new_mark = batch.agg(F.max(self._col)).first()[0]
        if new_mark is not None:
            self._mark = int(new_mark)
        self._prev_batch = batch
        return batch

    def release(self) -> None:
        """Unpersist the last returned batch (idempotent)."""
        if self._prev_batch is not None:
            self._prev_batch.unpersist()
            self._prev_batch = None

    def __enter__(self) -> "IncrementingPoller":
        return self

    def __exit__(self, *exc) -> None:
        self.release()
