"""Exact fixed-point log2 — cross-engine-deterministic logarithms.

Runtime ``ln()``/``log2()`` is banned in oracle-checked queries: the JVM's
``Math.log`` and DuckDB's libm disagree by 1 ulp on ~1% of inputs
(probe-verified: 4645/500000 integers, 11905/160000 rationals diverge
bitwise), so any float log in a hashed result eventually diverges. This
module provides the exact alternative used by the likelihood-ratio /
entropy operators:

    fp_log2(n) = 256 * floor(log2 n) + LUT256[top 8 mantissa bits]

an INTEGER in units of 1/256 bit. The integer part is ``length(bin(n))-1``
(pure bit length, the inverted_index trick); the fractional part is a
256-entry lookup table of ``floor(256*log2(1 + i/256))`` computed once in
Python at import time and embedded as the SAME literal array in the Spark
expression and the DuckDB oracle — no runtime libm on either engine, so
the value is reproducible bit-for-bit (probe-verified: 0 mismatches across
1..100000 and 60-bit values on both engines).

Accuracy: floor-style, ``fp_log2(n)/256 - log2(n)`` in ``[-0.0093, 0]``
bits for all n >= 1 (mantissa truncation + LUT floor, each < 1.2/256).
Exact at powers of two; fp_log2(1) = 0. Callers that difference four logs
(likelihood ratios) see at most ~0.037 bits of bias — ranking-grade
resolution with hash-grade determinism.

Scale: the expression is a handful of integer ops + one 256-literal array
probe, fully inside whole-stage codegen; nothing here shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: floor(256 * log2(1 + i/256)) for the 256 possible top-8 mantissa suffixes.
LUT256: list[int] = [
    int(math.floor(256 * math.log2(1 + i / 256.0))) for i in range(256)
]

_LUT_SPARK = "array(" + ",".join(str(v) for v in LUT256) + ")"
_LUT_DUCK = "[" + ",".join(str(v) for v in LUT256) + "]"


def fp_log2_py(n: int) -> int:
    """Python reference (tests + build-time constants)."""
    if n < 1:
        raise ValueError("fp_log2 requires n >= 1")
    e = n.bit_length() - 1
    idx = ((n >> (e - 8)) if e >= 8 else (n << (8 - e))) - 256
    return 256 * e + LUT256[idx]


def fp_log2_sql(x: str, dialect: str) -> str:
    """Fixed-point log2 of a positive BIGINT expression ``x``.

    ``x`` is inlined ~3 times — pass a simple column reference (hoist
    compound expressions into a prior select/CTE first).
    """
    if dialect == "spark":
        e = f"(length(bin({x})) - 1)"
        idx = (
            f"(CASE WHEN {e} >= 8 THEN shiftright({x}, CAST({e} - 8 AS INT)) "
            f"ELSE shiftleft({x}, CAST(8 - {e} AS INT)) END) - 256"
        )
        return f"(256 * {e} + element_at({_LUT_SPARK}, CAST({idx} AS INT) + 1))"
    if dialect == "duckdb":
        e = f"(length(bin({x})) - 1)"
        idx = (
            f"(CASE WHEN {e} >= 8 THEN {x} >> CAST({e} - 8 AS INTEGER) "
            f"ELSE {x} << CAST(8 - {e} AS INTEGER) END) - 256"
        )
        return (
            f"(256 * {e} + list_extract({_LUT_DUCK}, CAST({idx} AS INTEGER) + 1))"
        )
    raise ValueError(f"unknown dialect: {dialect}")


def fp_log2(col: str) -> Column:
    """Spark Column form (positive int64 input, int64 output).

    Takes a column NAME, not a Column: the expression inlines its input
    several times, so hoist computed values into a named column first.
    """
    if not isinstance(col, str):
        raise TypeError(
            "fp_log2 takes a column NAME (the expression inlines its input "
            "several times; hoist computed values into a named column first)"
        )
    return F.expr(fp_log2_sql(col, "spark"))
