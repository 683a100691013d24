"""Loaders for the driver-generated test tables (TESTDATA.md).

All reads are plain parquet scans so Catalyst gets predicate pushdown and
column pruning for free; callers select/filter on the returned DataFrame
rather than materializing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. ``name`` must be in TABLES.

    The driver's events.parquet timestamp encoding has varied by round:
    TIMESTAMP(NANOS) (rejected by Spark's reader unless read as long via
    the legacy conf, then rebuilt with integer division — ns values
    exceed double precision) and TIMESTAMP(MICROS) without the UTC flag
    (read as TIMESTAMP_NTZ, which unix_millis/window reject). Both are
    normalized here to a session-TZ TimestampType; the session pins UTC
    (session.py), so the NTZ cast is value-identical.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() entry points."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
