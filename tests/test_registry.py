"""Driver-contract invariants (__spark_entry__.py):
every oracle key has a query, names are unique, entry() runs with a
stable schema, and flagged query/oracle column names agree."""

from __future__ import annotations

import re

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 65


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "c_name",
        "last_type",
        "entries",
    ]
    assert df.count() > 0


def test_oracle_sql_has_no_spark_only_syntax():
    """Oracle strings must be DuckDB-runnable: no backticks, no Spark
    interval literals."""
    for name, sql in entry.oracle_sql().items():
        assert "`" not in sql, name
        assert not re.search(r"\bINTERVAL\s+\d+\s+DAYS\b", sql), name
