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


#: Mersenne prime 2^61-1: modulus of the universal MinHash family.
MINHASH_P = (1 << 61) - 1


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the universal hash family
    h_i(x) = (a_i * base(x) + b_i) mod 2^61-1. No RNG, so every
    engine/run derives identical values. The multipliers MUST be large
    (~2^61): with small a_i the product a*h never wraps the modulus,
    every h_i becomes a monotone transform of h, and all family members
    pick the SAME argmin shingle — perfectly correlated signatures.
    Golden-ratio multiples wrap many times and decorrelate."""
    gold_a = 0x9E3779B97F4A7C15
    gold_b = 0xC2B2AE3D27D4EB4F
    return [
        (((gold_a * (2 * i + 1)) % MINHASH_P) | 1, (gold_b * (i + 1)) % MINHASH_P)
        for i in range(n_hashes)
    ]


def minhash_base(col: Column | str) -> Column:
    """Shared 56-bit base hash, widened to DECIMAL(38,0) so the a*h+b
    products (up to ~2^87) never overflow. ONE md5 digest per input
    feeds the whole family — ~4x cheaper than a digest-per-hash family;
    DuckDB mirrors the arithmetic in HUGEINT (minhash_hash_sql)."""
    return md5_long(col).cast("decimal(38,0)")


def minhash_hash(base: Column, i: int) -> Column:
    a, b = minhash_params(i + 1)[i]
    return ((base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).cast("long")


def minhash_hash_sql(expr: str, i: int) -> str:
    """DuckDB rendering of minhash_hash(minhash_base(expr), i)."""
    a, b = minhash_params(i + 1)[i]
    base = f"CAST({md5_long_sql(expr)} AS HUGEINT)"
    return f"CAST(({base}*{a}+{b}) % {MINHASH_P} AS BIGINT)"


def fingerprint_hex(col: Column | str) -> Column:
    """Full 128-bit content fingerprint as hex (document identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)
