"""Stateful train tracker via applyInPandasWithState (SURVEY.md A4/X3) —
the one operator whose reference semantics are genuinely per-key
imperative state (consumers/models/line.py:31-54).

The aggregate formulation in views.py is preferred when it suffices
(pure JVM); this variant exists because (a) the reference's semantics
are naturally a keyed state machine, (b) it demonstrates the custom
stateful-operator extension point, and (c) at 100 TB-scale analogs a
watermark + state timeout bounds memory, which GroupState gives us
directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# per-(station_id, direction) state: ordering key of the winning effect +
# the occupant it implies
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_micros", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("train_id", T.StringType()),
        T.StructField("train_status", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.IntegerType()),
        T.StructField("direction", T.StringType()),
        T.StructField("train_id", T.StringType()),
        T.StructField("train_status", T.StringType()),
    ]
)


def explode_effects(arrivals: DataFrame) -> DataFrame:
    """Each arrival event = arrive(station,dir) + depart(prev_station,
    prev_dir); kind orders the depart before the arrive at equal ts
    (the reference applies them in that order within one message)."""
    arrive = arrivals.select(
        "station_id", "direction", "ts", "seq",
        F.lit(1).alias("kind"), "train_id", "train_status",
    )
    depart = arrivals.filter(
        F.col("prev_station_id").isNotNull() & F.col("prev_direction").isNotNull()
    ).select(
        F.col("prev_station_id").alias("station_id"),
        F.col("prev_direction").alias("direction"),
        "ts", "seq",
        F.lit(0).alias("kind"),
        F.lit(None).cast("string").alias("train_id"),
        F.lit(None).cast("string").alias("train_status"),
    )
    return arrive.unionByName(depart)


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Latest-effect-wins state machine per (station_id, direction)."""
    if state.exists:
        ts_us, seq, kind, train_id, train_status = state.get
    else:
        ts_us, seq, kind, train_id, train_status = -1, -1, -1, None, None

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            r_us = int(pd.Timestamp(row.ts).value // 1000)
            order = (r_us, int(row.seq), int(row.kind))
            if order > (ts_us, seq, kind):
                ts_us, seq, kind = order
                train_id = row.train_id if row.kind == 1 else None
                train_status = row.train_status if row.kind == 1 else None

    state.update((ts_us, seq, kind, train_id, train_status))
    yield pd.DataFrame(
        {
            "station_id": [key[0]],
            "direction": [key[1]],
            "train_id": [train_id],
            "train_status": [train_status],
        }
    )


def train_positions_stateful(effects: DataFrame) -> DataFrame:
    """applyInPandasWithState over exploded effects. Emits the current
    occupant of every (station, direction) touched in the micro-batch;
    downstream serving upserts these rows (update semantics)."""
    return (
        effects.groupBy("station_id", "direction")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
