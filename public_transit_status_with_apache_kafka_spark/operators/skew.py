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


def _salt_expr(salt_buckets: int, unique_col: str | Column | None) -> Column:
    """Salt expression for the two-phase aggs.

    With ``unique_col`` (a caller-supplied unique row key, e.g. an event
    id): salt = pmod(xxhash64(unique_col), buckets) — DETERMINISTIC per
    row, so a phase-1 task retried after a shuffle-fetch failure
    re-assigns identical salts and reducers can never double- or
    under-count. This is the retry-safe form; prefer it whenever a
    unique key exists.

    Without one: monotonically_increasing_id, a per-row disambiguator
    rather than a content hash — fully identical duplicate rows
    (repeated log lines, default values) are a common skew shape, and a
    content hash would send them all to ONE salt bucket, defeating the
    salting. CAVEAT (retry semantics): monotonically_increasing_id is
    nondeterministic on recompute. Directly over a deterministic scan
    that is harmless (a retried task re-reads the same rows in the same
    order, so ids — and salts — are reproduced). But if the input is
    itself a shuffle output or cached-then-evicted data, a retried
    phase-1 map task can assign DIFFERENT salts than the original
    attempt while reducers hold already-fetched partials, double- or
    under-counting rows (Spark's indeterminate-stage rollback does not
    cover arbitrary nondeterministic SQL expressions). Use the
    ``unique_col`` form in that position.
    """
    if unique_col is not None:
        u = F.col(unique_col) if isinstance(unique_col, str) else unique_col
        return F.pmod(F.xxhash64(u), F.lit(salt_buckets))
    return F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
    unique_col: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-tolerant count: groupBy(key, salt) -> groupBy(key).

    The salt round-robins even byte-identical rows of one hot key
    across salt_buckets phase-1 reducers; phase 2 merges salt_buckets
    rows per key — negligible. The salt is aggregated away, so its
    run-to-run instability never reaches the result. Pass
    ``unique_col`` (a unique row key) for the retry-safe deterministic
    salt — see :func:`_salt_expr` for when the default is unsafe."""
    salt = _salt_expr(salt_buckets, unique_col)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    salt_buckets: int = 16,
    unique_col: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-tolerant sum (same shape, salt choice, and retry
    caveat as salted_count — see :func:`_salt_expr`)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salt = _salt_expr(salt_buckets, unique_col)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(v).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("sum_value"))
