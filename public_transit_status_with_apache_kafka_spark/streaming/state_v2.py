"""Stateful train tracker on transformWithStateInPandas (SURVEY.md
A4/X3) — the Spark 4.x arbitrary-stateful-processing API that succeeds
applyInPandasWithState (state.py keeps that variant; both must agree,
tests/test_train_tracker.py).

Why carry both: transformWithState is where new capability lands
(typed value/list/map state, event/processing-time timers, TTL, initial
state, changelog checkpointing v2) and is the 100 TB-scale path — TTL
on the value state replaces the watermark-eviction dance for bounding
per-key state on unbounded key spaces. Reference semantics per
consumers/models/line.py:31-54, same as state.py.

Runtime requirements (gated, not assumed): transformWithStateInPandas
needs (a) the RocksDB state store provider and (b) `google.protobuf`
on the driver/workers (PySpark's TWS wire protocol is protobuf-based;
pyspark.sql.streaming.proto.StateMessage_pb2 imports it). This
container ships no protobuf, so the end-to-end streaming test skips
here (tests/test_train_tracker.py::test_tracker_v2_stream_converges);
the processor's per-key logic is still verified directly against the
v1 semantics via a fake state handle — the module import itself has no
protobuf dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .state import OUTPUT_SCHEMA, STATE_SCHEMA


class TrainTrackerProcessor(StatefulProcessor):
    """Latest-effect-wins occupant per (station_id, direction), identical
    ordering rules to state._track: effects ordered by (ts, seq, kind)
    with depart(kind=0) before arrive(kind=1) at equal timestamps."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._occupant = handle.getValueState("occupant", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._occupant.exists():
            ts_us, seq, kind, train_id, train_status = self._occupant.get()
        else:
            ts_us, seq, kind, train_id, train_status = -1, -1, -1, None, None

        for pdf in rows:
            for row in pdf.itertuples(index=False):
                r_us = int(pd.Timestamp(row.ts).value // 1000)
                order = (r_us, int(row.seq), int(row.kind))
                if order > (ts_us, seq, kind):
                    ts_us, seq, kind = order
                    train_id = row.train_id if row.kind == 1 else None
                    train_status = row.train_status if row.kind == 1 else None

        self._occupant.update((ts_us, seq, kind, train_id, train_status))
        yield pd.DataFrame(
            {
                "station_id": [key[0]],
                "direction": [key[1]],
                "train_id": [train_id],
                "train_status": [train_status],
            }
        )

    def close(self) -> None:
        pass


def train_positions_stateful_v2(effects: DataFrame) -> DataFrame:
    """transformWithStateInPandas over exploded effects (state.
    explode_effects). Update mode, processing-time ordering semantics
    (timeMode none): emits the current occupant of every touched key
    per micro-batch, exactly like state.train_positions_stateful."""
    return effects.groupBy("station_id", "direction").transformWithStateInPandas(
        statefulProcessor=TrainTrackerProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
