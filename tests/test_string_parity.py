"""Property tests pinning the string Column helpers to the reference's
per-record Python semantics (producers/models/station.py:22-28,
line.py:55-57) — arbitrary inputs, exact equality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from public_transit_status_with_apache_kafka_spark.functions import strings


def _py_topic_safe(name: str) -> str:
    """The reference's exact chain (station.py:22-28)."""
    return (
        name.lower()
        .replace("/", "_and_")
        .replace(" ", "_")
        .replace("-", "_")
        .replace("'", "")
    )


station_names = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" /-'&().",
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(names=st.lists(station_names, min_size=1, max_size=20))
def test_topic_safe_name_matches_reference(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r.t for r in df.select(strings.topic_safe_name("name").alias("t")).collect()]
    assert got == [_py_topic_safe(n) for n in names]


@settings(max_examples=20, deadline=None)
@given(
    colors=st.lists(st.sampled_from(["blue", "green", "red"]), min_size=1, max_size=10),
    nums=st.lists(st.integers(0, 999), min_size=10, max_size=10),
)
def test_train_id_matches_reference(spark, colors, nums):
    """f"{color[0].upper()}L{num:03d}" (line.py:55-57)."""
    rows = list(zip(colors, nums[: len(colors)]))
    df = spark.createDataFrame(rows, "color string, num int")
    got = [r.t for r in df.select(strings.train_id("color", "num").alias("t")).collect()]
    assert got == [f"{c[0].upper()}L{n:03d}" for c, n in rows]


def test_display_status(spark):
    df = spark.createDataFrame([("out_of_service",), ("in_service",)], "s string")
    got = [r.d for r in df.select(strings.display_status("s").alias("d")).collect()]
    assert got == ["out of service", "in service"]


@settings(max_examples=10, deadline=None)
@given(names=st.lists(station_names, min_size=1, max_size=10))
def test_row_udf_equals_column_chain(spark, names):
    """The row-at-a-time F.udf surface (SURVEY section 2.9): wrapping the
    reference's exact Python chain as a UDF must agree with the
    JVM-side Column implementation on arbitrary input. (The engine uses
    the Column form everywhere — this pins that they're interchangeable.)"""
    # local def: cloudpickle serializes it by value (a module-level
    # function would be pickled as an import executors can't resolve)
    def chain(name: str) -> str:
        return (
            name.lower()
            .replace("/", "_and_")
            .replace(" ", "_")
            .replace("-", "_")
            .replace("'", "")
        )

    py_udf = F.udf(chain, "string")
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select(
        py_udf("name").alias("u"),
        strings.topic_safe_name("name").alias("c"),
    ).collect()
    assert all(r.u == r.c for r in rows)
