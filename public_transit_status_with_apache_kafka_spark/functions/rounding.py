"""Cross-engine deterministic HALF-UP rounding for integer ratios.

``F.round`` on a double rounds its SHORTEST DECIMAL representation
(Java ``BigDecimal.valueOf``), while DuckDB's ``round`` rounds the
BINARY value: for a non-dyadic terminating decimal like 1.16315 (whose
double sits just below the printed half) Spark emits 1.1632 and DuckDB
1.1631. Ratios of integers land on such boundaries whenever the
denominator's factors are only 2s and 5s — hypothesis surfaced one in
the bigram LM score — so every rounded integer ratio is a latent
oracle-mismatch.

The fix computes ``round(num/den, d)`` entirely in integers:
``q = (2*num*10^d + den) div (2*den)`` (floor(num/den*10^d + 1/2)),
then one exact int->double division by ``10^d``. Identical in both
engines by construction for non-negative ratios.

Exactness bound: intermediates must stay below 2^53 for the final
long->double conversion (|2*num*10^d| < 9e15 — holds through sf>=1 for
every current user; the pure-int64 path is exact far beyond that).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ratio_round(num: Column, den: Column, decimals: int = 4) -> Column:
    """HALF-UP ``round(num/den, decimals)`` for integer-valued Columns,
    identical across engines. ``den`` must be positive, ``num``
    non-negative."""
    p = 10**decimals
    a = (num.cast("long") * (2 * p) + den.cast("long")).cast("long")
    b = (den.cast("long") * 2).cast("long")
    q = (a - F.pmod(a, b)) / b  # exact integer division (values < 2^53)
    return q / F.lit(float(p))


def ratio_round_sql(num: str, den: str, decimals: int = 4) -> str:
    """DuckDB rendering of :func:`ratio_round` (``//`` is int64 floor
    division there)."""
    p = 10**decimals
    return f"(((({num}) * {2 * p} + ({den})) // (2 * ({den}))) / {float(p)})"
