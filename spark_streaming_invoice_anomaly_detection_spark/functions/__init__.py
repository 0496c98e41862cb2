"""Scalar column functions (SURVEY.md §2.5) — all native Spark expressions.

Everything here stays inside whole-stage codegen; no Python UDFs. The
reference's Scala closures (F1-F6) become column expressions.
"""

from .scalars import (
    extract_hour,
    is_cancellation,
    is_empty,
    try_double,
    try_int,
)

__all__ = ["extract_hour", "is_cancellation", "is_empty", "try_double", "try_int"]
