"""Distributed CTA data generator: the reference simulator's semantics
as pure Spark expressions over ``spark.range`` — generates fixtures at
ANY scale (the 100 TB path), unlike generator.py's driver-side rows.

Reference semantics reproduced distributively (citations /root/reference):
  - W1 tick clock: event i of train t happens at start + tick*5min
    (producers/simulation.py:27-32)
  - train walk + prev_station/prev_direction via lag() over each train's
    event-time order (producers/models/line.py:82-136) — the previous
    arrival IS the previous row, no driver state
  - P11 math chain for turnstile volumes: floor(riders * ratio / steps)
    + uniform noise, clamped >= 0 (producers/models/turnstile_hardware.py:52-66)
  - A7 fan-out: one row PER RIDER via explode(sequence(1, n))
    (producers/models/turnstile.py:41-59)
  - W3/W4 hour-of-day ratio curve and weekday/weekend branch (intended
    semantics; the reference's always-weekday bug is documented in SURVEY W4)

Determinism without driver RNG: every random draw is a pure function of
(row id, seed) through xxhash64, so any executor computes the same value
for the same row — re-runs and retries are bit-identical, which the
tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LINES = ("blue", "green", "red")
TRAIN_STATUSES = ("in_service", "out_of_service", "broken_down")


def _uniform(*cols, seed: int) -> F.Column:
    """Deterministic U[0,1) from arbitrary key columns + seed (hash-based,
    partition-independent — unlike F.rand, which depends on the split)."""
    h = F.xxhash64(*cols, F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0))


def arrivals_at_scale(
    spark: SparkSession,
    n_events: int,
    n_stations_per_line: int = 32,
    n_trains_per_line: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Arrival events for 3 lines; each train walks its line one station
    per tick, bouncing at the ends; prev_* from lag() per train."""
    total_trains = 3 * n_trains_per_line
    base = spark.range(n_events).select(
        F.col("id").alias("seq"),
        (F.col("id") % total_trains).alias("train_no"),
        (F.col("id") / total_trains).cast("long").alias("tick"),
    )
    line_idx = (F.col("train_no") / n_trains_per_line).cast("int")
    # triangle wave: position bounces 0..n-1..0 with period 2(n-1)
    n = n_stations_per_line
    phase = (F.col("tick") + F.col("train_no") * 3) % (2 * (n - 1))
    pos = F.when(phase < n, phase).otherwise(2 * (n - 1) - phase)
    direction = F.when(phase < n - 1, "a").otherwise("b")
    status_u = _uniform(F.col("seq"), seed=seed)
    status = (
        F.when(status_u < 0.9, TRAIN_STATUSES[0])
        .when(status_u < 0.95, TRAIN_STATUSES[1])
        .otherwise(TRAIN_STATUSES[2])
    )
    ev = base.select(
        "seq",
        F.timestamp_seconds(F.lit(1704067200) + F.col("tick") * 300).alias("ts"),
        (line_idx * 100 + pos).cast("int").alias("station_id"),
        F.concat(
            F.upper(F.substring(F.element_at(F.array(*[F.lit(x) for x in LINES]), line_idx + 1), 1, 1)),
            F.lit("L"),
            F.lpad((F.col("train_no") % n_trains_per_line).cast("string"), 3, "0"),
        ).alias("train_id"),
        direction.alias("direction"),
        F.element_at(F.array(*[F.lit(x) for x in LINES]), line_idx + 1).alias("line"),
        status.alias("train_status"),
    )
    w = Window.partitionBy("train_id").orderBy("seq")
    return ev.select(
        "ts",
        "station_id",
        "train_id",
        "direction",
        "line",
        "train_status",
        F.lag("station_id").over(w).alias("prev_station_id"),
        F.lag("direction").over(w).alias("prev_direction"),
        "seq",
    )


def turnstile_at_scale(
    spark: SparkSession,
    n_station_ticks: int,
    n_stations: int = 96,
    seed: int = 42,
) -> DataFrame:
    """One row PER RIDER (A7): per (station, tick), compute the rider
    count with the reference's math chain (P11 + W3 hourly curve + W4
    day branch), then explode into that many events."""
    base = spark.range(n_station_ticks).select(
        F.col("id").alias("cell"),
        (F.col("id") % n_stations).cast("int").alias("station_id"),
        (F.col("id") / n_stations).cast("long").alias("tick"),
    )
    ts = F.timestamp_seconds(F.lit(1704067200) + F.col("tick") * 300)
    seed_riders = 2000 + (F.pmod(F.xxhash64("station_id", F.lit(seed)), F.lit(5000)))
    hr = F.hour(ts)
    # hour-of-day curve (W3): morning/evening peaks, overnight trough
    ratio = (
        F.when((hr >= 7) & (hr <= 9), 0.10)
        .when((hr >= 16) & (hr <= 18), 0.12)
        .when((hr >= 10) & (hr <= 15), 0.06)
        .when((hr >= 19) & (hr <= 22), 0.04)
        .otherwise(0.01)
    )
    # W4 *intended* branch (the reference's version is always-weekday)
    dow = F.dayofweek(ts)  # 1=Sunday..7=Saturday
    day_factor = F.when(dow == 1, 0.5).when(dow == 7, 0.7).otherwise(1.0)
    noise = (F.pmod(F.xxhash64("cell", F.lit(seed + 1)), F.lit(10)) - 5).cast("int")
    riders = F.greatest(
        F.floor(seed_riders * ratio * day_factor / 12).cast("int") + noise, F.lit(0)
    )
    cells = base.select("station_id", ts.alias("ts"), riders.alias("n_riders"))
    return cells.select(
        "ts",
        "station_id",
        F.explode(F.sequence(F.lit(1), F.col("n_riders"))).alias("rider_no"),
    ).drop("rider_no")


def weather_at_scale(spark: SparkSession, n_hours: int, seed: int = 42) -> DataFrame:
    """Hourly weather: random-walk temperature via a windowed prefix sum
    of triangular steps (inverse-CDF of U), clamped to [-20, 100].

    The global cumulative window runs on ONE partition — correct here
    because weather is one row per hour (87k rows for a decade); a
    100 TB-scale walk would segment the series and chain segment offsets."""
    base = spark.range(n_hours).select(F.col("id").alias("h"))
    u = _uniform(F.col("h"), seed=seed + 2)
    # inverse CDF of triangular(-10, 10, mode 0)
    step = F.when(
        u < 0.5, -10 + F.sqrt(u * 200.0)
    ).otherwise(10 - F.sqrt((1 - u) * 200.0))
    # BOUNDED global Window: the hour domain is simulated-duration rows
    # (one per hour, 87k/decade), never corpus-sized — do NOT copy this
    # shape into a corpus-facing operator (use operators/rank.py there)
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    temp = F.least(F.greatest(F.lit(40.0) + F.sum(step).over(w), F.lit(-20.0)), F.lit(100.0))
    su = _uniform(F.col("h"), seed=seed + 3)
    status = (
        F.when(su < 0.3, "sunny")
        .when(su < 0.5, "partly_cloudy")
        .when(su < 0.7, "cloudy")
        .when(su < 0.85, "windy")
        .otherwise("precipitation")
    )
    return base.select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("h") * 3600).alias("ts"),
        F.round(temp, 1).alias("temperature"),
        status.alias("status"),
    )
