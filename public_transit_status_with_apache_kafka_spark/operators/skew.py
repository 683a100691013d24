"""Skew mitigation (SURVEY.md §4 scale hygiene; brief: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitting handles skewed JOINS at runtime. Salting is
the complementary technique for skewed AGGREGATIONS and for engines/
paths where AQE cannot see the skew: decompose a hot group key into
salt_buckets sub-keys, partially aggregate per (key, salt), then
combine per key. Works for any decomposable aggregate (count/sum/min/
max); the result is exactly the plain groupBy — which the DuckDB oracle
verifies for the registered query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-tolerant count: groupBy(key, salt) -> groupBy(key).

    The salt derives from monotonically_increasing_id — a per-row
    disambiguator, NOT a hash of the row's columns: fully identical
    duplicate rows (repeated log lines, default values) are a common
    skew shape, and a content hash would send them all to ONE salt
    bucket, defeating the salting. The id is unique per row, so even a
    key whose rows are byte-identical round-robins across salt_buckets
    phase-1 reducers; phase 2 merges salt_buckets rows per key —
    negligible. The salt is aggregated away, so its run-to-run
    instability (partition layout dependence) never reaches the
    result."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str | Column, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-tolerant sum (same shape and per-row salt as
    salted_count — see its docstring for why the salt must not be a
    content hash)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(v).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("sum_value"))
