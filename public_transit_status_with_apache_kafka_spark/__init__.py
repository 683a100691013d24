"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CTA transit-status pipeline
(weaslbe/public-transit-status-with-apache-kafka), re-expressed
Spark-first.

Layout:
  session.py    -- SparkSession factory tuned for local[N] test runs and
                   documented for 1000-executor scale.
  io_util.py    -- table loaders for the driver test data.
  functions/    -- reusable Column-expression helpers (strings, hashing,
                   vectors, text stats). No row-at-a-time Python UDFs.
  operators/    -- composite operators (latest-per-key, train tracker,
                   dedup, similarity, text analysis, multimodal).
  plans/        -- registered queries: each module exposes QUERIES (name ->
                   fn(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB
                   SQL) consumed by __spark_entry__.py.
  sources/      -- batch/stream source wrappers (parquet, csv, kafka with
                   Confluent wire-format handling, jdbc poller, rate).
  streaming/    -- structured-streaming lift of the derived views, stateful
                   train tracker, kafka sinks.
  generator.py  -- deterministic CTA fixture generator (SURVEY.md section 7.1 M1).
"""

__version__ = "0.1.0"

from .io_util import load  # noqa: E402
from .session import get_spark  # noqa: E402

__all__ = ["get_spark", "load", "__version__"]
