"""Cross-engine deterministic hash family.

The driver verifies every query against DuckDB, so hash functions used in
dedup/minhash operators must produce *identical* values in Spark SQL and
DuckDB. ``md5`` is the common primitive: both engines emit the same
lowercase hex string, and both can turn a hex prefix into a BIGINT
(Spark ``conv(hex, 16, 10)``, DuckDB ``CAST('0x'||hex AS BIGINT)``).

We take the first 14 hex digits (56 bits) so the value always fits into a
signed 64-bit integer without overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 14  # 56 bits < 2^63, overflow-safe in both engines


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """56-bit integer hash of a string column, identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit(salt))
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB SQL rendering of :func:`md5_long` for oracle queries."""
    inner = f"concat({expr}, '{salt}')" if salt is not None else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, {HEX_DIGITS})) AS BIGINT)"


def md5_chunk(col: Column | str, i: int) -> Column:
    """i-th 56-bit hash from a *family*: hash i uses chunk ``i % 2`` of
    md5(s + '#'*(i//2)). Two hashes per md5 evaluation — half the digest
    cost of one-salt-per-hash; identical in DuckDB (md5_chunk_sql)."""
    c = F.col(col) if isinstance(col, str) else col
    salt = "#" * (i // 2)
    if salt:
        c = F.concat(c, F.lit(salt))
    start = 1 + (i % 2) * HEX_DIGITS
    return F.conv(F.substring(F.md5(c), start, HEX_DIGITS), 16, 10).cast("long")


def md5_chunk_sql(expr: str, i: int) -> str:
    salt = "#" * (i // 2)
    inner = f"concat({expr}, '{salt}')" if salt else expr
    start = 1 + (i % 2) * HEX_DIGITS
    return f"CAST(concat('0x', substr(md5({inner}), {start}, {HEX_DIGITS})) AS BIGINT)"


def fingerprint_hex(col: Column | str) -> Column:
    """Full 128-bit content fingerprint as hex (document identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)
