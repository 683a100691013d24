"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship dashboard-snapshot query on sf0.001
queries()      -> one entry per implemented operator (SURVEY.md section 2),
                  merged from public_transit_status_with_apache_kafka_spark.plans
oracle_sql()   -> matching DuckDB SQL (omitted only for genuinely
                  non-SQL-expressible ops: Spark-internal approx sketches,
                  random-plane LSH, mapInPandas decode stub, generated
                  CTA fixtures, live streaming replays)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from public_transit_status_with_apache_kafka_spark import plans

_QUERIES, _ORACLE = plans.collect()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the CTA dashboard snapshot (J5+O2 analog) over
    /root/testdata/sf0.001 — dimension LEFT JOIN latest-state LEFT JOIN
    running counts with '---'/0 defaults."""
    return _QUERIES["cta_dashboard_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
