"""Deterministic CTA-domain fixture generator (SURVEY.md section 7.1 M1).

Replaces the reference's five-process simulator (producers/simulation.py,
producers/models/*) with a seeded, replayable generator so correctness
tests can compare batch and streaming runs on identical inputs.

Semantics reproduced (with citations into /root/reference):
  - stations: 2 stop rows per station_id, boolean line flags
    (load_stations.sql:1-12, producers/data/cta_stations.csv)
  - trains shuttle along the line one station per tick, direction flips at
    the ends; each arrival carries prev_station_id/prev_direction, null on
    initial placement (producers/models/line.py:82-136)
  - turnstile: one event PER RIDER, no count column — count is event
    multiplicity (producers/models/turnstile.py:41-59, README.md:98)
  - weather: one event per simulated hour, random-walk temperature
    clamped to [-20, 100] (producers/models/weather.py:57-65,
    producers/simulation.py:72-73)
  - the reference's always-weekday bug (turnstile_hardware.py:56) is NOT
    reproduced; intended weekday/sat/sun branching is used (SURVEY W4).

Fixture sizes are hand-checkable (FIXTURES.md B6); everything derives from
``seed`` via a local PRNG — no wall-clock, no global random state.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LINES = ("blue", "green", "red")

STATIONS_SCHEMA = T.StructType(
    [
        T.StructField("stop_id", T.IntegerType(), False),
        T.StructField("direction_id", T.StringType(), False),
        T.StructField("stop_name", T.StringType(), False),
        T.StructField("station_name", T.StringType(), False),
        T.StructField("station_descriptive_name", T.StringType(), False),
        T.StructField("station_id", T.IntegerType(), False),
        T.StructField("order", T.IntegerType(), False),
        T.StructField("red", T.BooleanType(), False),
        T.StructField("blue", T.BooleanType(), False),
        T.StructField("green", T.BooleanType(), False),
    ]
)

ARRIVALS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("station_id", T.IntegerType(), False),
        T.StructField("train_id", T.StringType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("line", T.StringType(), False),
        T.StructField("train_status", T.StringType(), False),
        T.StructField("prev_station_id", T.IntegerType(), True),
        T.StructField("prev_direction", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),  # generation order tie-break
    ]
)

TURNSTILE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("station_id", T.IntegerType(), False),
        T.StructField("station_name", T.StringType(), False),
        T.StructField("line", T.StringType(), False),
    ]
)

WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("temperature", T.FloatType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

WEATHER_STATUSES = ("sunny", "partly_cloudy", "cloudy", "windy", "precipitation")
TRAIN_STATUSES = ("in_service", "out_of_service", "broken_down")



def _local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Fixture rows as a 4-slice DataFrame: the default createDataFrame
    parallelizes a few hundred rows into defaultParallelism (32) Python
    partitions, and EVERY downstream action then spawns 32 Python
    workers for trivial data — measured at seconds per action, which
    multiplied across the planted-stream queries dominated the round-7
    full-sweep wall cost. Four slices keep multi-partition semantics
    (coalesce/repartition behavior unchanged) at worker-count cost
    proportional to the data."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema
    )

def generate_stations(spark: SparkSession, n_per_line: int = 6) -> DataFrame:
    """Stations dimension: per line, n stations, 2 stop rows each (the
    duplication A2 must collapse). station_ids are disjoint across lines
    except one shared transfer station per line pair (like the real CTA)."""
    rows = []
    stop_id = 0
    for li, line in enumerate(LINES):
        for order in range(n_per_line):
            station_id = li * 100 + order
            name = f"{line}_st_{order}"
            for direction in ("N", "S"):
                rows.append(
                    (
                        stop_id,
                        direction,
                        f"{name}_{direction}",
                        name,
                        f"{name} ({line.title()} Line)",
                        station_id,
                        order,
                        line == "red",
                        line == "blue",
                        line == "green",
                    )
                )
                stop_id += 1
    return _local_df(spark, rows, STATIONS_SCHEMA)


def _shuttle_positions(n_stations: int, n_trains: int, ticks: int):
    """Deterministic shuttle trajectories: yields per (train, tick) the
    (pos, direction, prev_pos, prev_direction). Direction 'a' moves toward
    higher order, 'b' back — flip at the ends (line.py:82-136)."""
    # spread initial positions evenly, all heading 'a'
    state = []
    for t in range(n_trains):
        state.append([t * max(1, n_stations // max(1, n_trains)) % n_stations, "a"])
    for tick in range(ticks):
        for t in range(n_trains):
            pos, direction = state[t]
            if tick == 0:
                yield t, tick, pos, direction, None, None
                continue
            step = 1 if direction == "a" else -1
            new_pos = pos + step
            new_dir = direction
            if new_pos >= n_stations:
                new_pos, new_dir = n_stations - 2, "b"
            elif new_pos < 0:
                new_pos, new_dir = 1, "a"
            yield t, tick, new_pos, new_dir, pos, direction
            state[t] = [new_pos, new_dir]


def generate_arrivals(
    spark: SparkSession,
    n_per_line: int = 6,
    n_trains: int = 2,
    ticks: int = 20,
    seed: int = 42,
    start: datetime = datetime(2024, 1, 1),
) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    seq = 0
    for li, line in enumerate(LINES):
        for train, tick, pos, direction, prev_pos, prev_dir in _shuttle_positions(
            n_per_line, n_trains, ticks
        ):
            ts = start + timedelta(minutes=5 * tick)
            status = TRAIN_STATUSES[0] if rng.random() < 0.9 else rng.choice(TRAIN_STATUSES[1:])
            rows.append(
                (
                    ts,
                    li * 100 + pos,
                    f"{line[0].upper()}L{train:03d}",
                    direction,
                    line,
                    status,
                    None if prev_pos is None else li * 100 + prev_pos,
                    prev_dir,
                    seq,
                )
            )
            seq += 1
    return _local_df(spark, rows, ARRIVALS_SCHEMA)


def generate_turnstile(
    spark: SparkSession,
    n_per_line: int = 6,
    ticks: int = 20,
    seed: int = 42,
    start: datetime = datetime(2024, 1, 1),
) -> DataFrame:
    """One row per rider (A7 fan-out): per station/tick, a seeded count in
    [0, 6) expands to that many identical events (turnstile.py:41-59)."""
    rng = random.Random(seed + 1)
    rows = []
    for li, line in enumerate(LINES):
        for order in range(n_per_line):
            for tick in range(ticks):
                ts = start + timedelta(minutes=5 * tick)
                for _ in range(rng.randrange(0, 6)):
                    rows.append((ts, li * 100 + order, f"{line}_st_{order}", line))
    return _local_df(spark, rows, TURNSTILE_SCHEMA)


def generate_weather(
    spark: SparkSession,
    hours: int = 10,
    seed: int = 42,
    start: datetime = datetime(2024, 1, 1),
) -> DataFrame:
    """Hourly random-walk temperature clamped to [-20, 100]
    (weather.py:57-65); status drawn per hour."""
    rng = random.Random(seed + 2)
    rows = []
    temp = 40.0
    for h in range(hours):
        temp = min(100.0, max(-20.0, temp + rng.triangular(-10, 10)))
        rows.append(
            (start + timedelta(hours=h), float(round(temp, 1)), rng.choice(WEATHER_STATUSES))
        )
    return _local_df(spark, rows, WEATHER_SCHEMA)


def generate_all(spark: SparkSession, **kw) -> dict[str, DataFrame]:
    return {
        "stations": generate_stations(spark, kw.get("n_per_line", 6)),
        "arrivals": generate_arrivals(spark, **{k: v for k, v in kw.items() if k in
                                                ("n_per_line", "n_trains", "ticks", "seed")}),
        "turnstile": generate_turnstile(spark, **{k: v for k, v in kw.items() if k in
                                                  ("n_per_line", "ticks", "seed")}),
        "weather": generate_weather(spark, **{k: v for k, v in kw.items() if k in
                                              ("hours", "seed")}),
    }
