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


def ratio_round_big(num: Column, den: Column, decimals: int = 4) -> Column:
    """HALF-AWAY-FROM-ZERO ``round(num/den, decimals)`` for integer
    ratios whose intermediates exceed :func:`ratio_round`'s 2^53 bound
    (e.g. the n*Sxy - Sx*Sy sums of an exact-integer regression):
    arithmetic runs in DECIMAL(38,0) (exact to 1e38; DuckDB mirrors in
    HUGEINT, :func:`ratio_round_big_sql`), ``num`` may be NEGATIVE
    (sign split off, magnitude rounded half-up — half-away-from-zero
    overall, matching the HUGEINT form). ``den`` must be positive.

    The quotient itself must satisfy |round(num/den) * 10^d| < 2^53 so
    the final long -> double conversion is exact — the ceiling moved
    from the INPUTS (ratio_round) to the OUTPUT, which for slopes,
    entropies and rates is tiny. Exactness: (a - pmod(a, b)) is an
    exact multiple of b, so the decimal division has a zero remainder
    and no rounding occurs at any scale."""
    p = 10**decimals
    a = F.abs(num).cast("decimal(38,0)") * F.lit(2 * p) + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * F.lit(2)
    q = ((a - F.pmod(a, b)) / b).cast("long")
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sgn * q) / F.lit(float(p))


def ratio_round_big_sql(num: str, den: str, decimals: int = 4) -> str:
    """DuckDB rendering of :func:`ratio_round_big`: HUGEINT (int128)
    arithmetic, ``//`` floor division on the non-negative magnitude."""
    p = 10**decimals
    return (
        f"((CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END)"
        f" * ((ABS(CAST(({num}) AS HUGEINT)) * {2 * p} + ({den}))"
        f" // (2 * CAST(({den}) AS HUGEINT))) / {float(p)})"
    )
