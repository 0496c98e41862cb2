"""Cross-engine-exact aggregation arithmetic.

Money-like columns in the test data carry fixed-decimal semantics (2-dec
prices, 2-dec discounts). Averaging them lands *exactly* on decimal rounding
half-boundaries (e.g. avg of 4 prices = x.xx5) where Spark (HALF_UP via
BigDecimal) and DuckDB disagree — observed on ~1% of groups. Tolerance isn't
available: the driver compares value *hashes*.

The engine's discipline, applied on BOTH the Spark and the oracle side:

1. Fixed-decimal data aggregates in scaled int64 (exact, order-independent);
   results are exposed as doubles via the *same* final arithmetic
   (``sum_scaled / 10^scale / n``) — IEEE ops on identical inputs are
   bit-identical across engines.
2. Sums of k-decimal values may be rounded to k decimals (the true value is
   a decimal-grid point, never a half-boundary; binary noise ~1e-10 can't
   reach the 5e-(k+1) boundary).
3. Never ``round(x, n)`` where x can be an exact multiple of 5*10^-(n+1).

At 100 TB the same trick is *also* the fast path: int64 hash-agg beats
decimal128 and dodges double-summation non-determinism under AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column | str, scale: int) -> Column:
    """Fixed-decimal double -> exact scaled int64.

    x * 10^scale is ~1e-9 from an integer k, never near k+.5 (the input is
    decimal-grid), so ANY nearest-integer rule gives k. ``floor(x+0.5)``
    is chosen over ``round(x, 0)`` because Spark's Round on doubles
    allocates a BigDecimal per row while floor is a bare codegen intrinsic
    — measured 2.5x faster on the Q1-shape scan-agg, identical int64 on
    every row (also for negatives: floor(k±1e-9+0.5)=k). The cast is then
    exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


def scaled_long_sql(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`scaled_long` (same IEEE multiply, same floor)."""
    return f"CAST(floor(({expr}) * {float(10 ** scale)!r} + 0.5) AS BIGINT)"


def exact_sum(col: Column | str, scale: int) -> Column:
    """Exact sum of a fixed-decimal column, exposed as double."""
    return F.sum(scaled_long(col, scale)) / F.lit(float(10**scale))


def exact_sum_sql(expr: str, scale: int) -> str:
    # DuckDB sums BIGINT into HUGEINT; cast back before the double division
    # so both engines divide an int64 by the same double literal.
    return (
        f"CAST(sum({scaled_long_sql(expr, scale)}) AS BIGINT)"
        f" / {float(10 ** scale)!r}"
    )


def exact_avg(col: Column | str, scale: int) -> Column:
    """Exact-input average: (exact sum as double) / count — deterministic."""
    return exact_sum(col, scale) / F.count(F.lit(1))


def exact_avg_sql(expr: str, scale: int) -> str:
    return f"{exact_sum_sql(expr, scale)} / count(*)"
