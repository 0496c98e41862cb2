"""Query registry backing ``__spark_entry__.py`` (the driver contract)."""

from .registry import REGISTRY, QuerySpec, oracle_sql, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
