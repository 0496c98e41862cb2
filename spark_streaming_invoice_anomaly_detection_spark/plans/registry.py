"""QuerySpec registry: every operator the engine claims, with its oracle.

Each entry pairs a Spark DataFrame builder with the ANSI-SQL equivalent that
DuckDB runs on the same parquet tables (driver correctness gate,
CORRECTNESS_r{N}.json). Column names are aliased identically on both sides
because the driver hashes values after sorting columns by name.

Non-SQL-expressible operators (stateful streaming, iterative ML) register
with ``oracle=None`` -> the driver records a rows-only check.

Floating-point discipline: aggregates whose accumulation order differs
between engines (sum/avg over doubles) are rounded to 2 decimals on BOTH
sides; min/max/count and integer-valued sums are exact and left unrounded.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers QuerySpecs (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # ml_queries registers right after the reference queries: the driver
    # walks the registry in insertion order under a wall-clock budget, and
    # round 1 showed the three ML entries starving at the tail of the list
    # (VERDICT.md "What's wrong" #2).
    from . import reference_queries  # noqa: F401
    from . import ml_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import advanced  # noqa: F401
    from . import extensions  # noqa: F401

    _LOADED = True
