"""Parquet table catalog over the driver's test data (TESTDATA.md).

Columnar parquet scans are the engine's default source: Catalyst pushes
filters and prunes columns into the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``), which is the behavior that matters at
100 TB — never read a column you don't project.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: Columns written as parquet TIMESTAMP(NANOS), which Spark's reader rejects.
#: We read them as int64 nanos (legacy conf) and truncate to microseconds —
#: the same truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

#: Session-scoped table-HANDLE cache (r11 optimization round): the lazy
#: DataFrame returned by ``spark.read.parquet`` + the nanos/NTZ fixups,
#: keyed by (applicationId, resolved sf_dir, table). This memoizes the
#: DATASOURCE RESOLUTION ONLY — file listing, footer schema read, and the
#: ~69 ms of py4j round-trips each ``load_table`` call paid — exactly what
#: a real deployment's catalog (metastore/Iceberg) amortizes for every
#: query. No data is cached: every action on the returned frame re-scans
#: the parquet bytes (DataFrames are immutable, so sharing the handle is
#: safe). Measured effect at sf0.1: join_five_way_volume build time
#: 0.52 s -> 0.11 s (6 tables), top_returning_customers 0.36 s -> 0.08 s.
#: Keyed by applicationId, not id(spark): Python ids are reused after GC
#: across the many short-lived test sessions. Entries from OTHER
#: applications are evicted on insert (see load_table), so the dict is
#: bounded by one application's (sf_dir, table) working set.
#:
#: SHARED-HANDLE CONTRACT: the memoized DataFrame is the same object for
#: every consumer — never ``.cache()``/``.persist()`` a handle returned by
#: ``load_table`` (it would silently pin cached data for every other query
#: in the session; pinned by tests/test_r12_optimizations.py). Persist a
#: derived frame (``df.select(...)``) instead.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table. Schema comes from the parquet footer (exact).

    The resolved handle is memoized per (session, sf_dir, table) — see
    ``_TABLE_CACHE``; pure plan-object reuse, no data caching.
    """
    sf_dir = sf_dir or sf_dir_from_env()
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # Evict entries from other applications on insert (r11 ADVICE): keys
    # from stopped sessions would otherwise pin py4j DataFrame references
    # forever across long multi-session test runs. One application's
    # handles (all sf_dirs) stay cached for its lifetime.
    for stale in [k for k in _TABLE_CACHE if k[0] != app_id]:
        del _TABLE_CACHE[stale]
    if name in _NANOS_TS_COLS:
        # runtime-settable SQLConf; required before the scan is planned
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive parquet timestamp[us] must read as TIMESTAMP_LTZ, not NTZ: epoch
    # functions (unix_micros et al.) reject NTZ, and the LTZ read takes the
    # stored micros as epoch-UTC independent of session timezone. Set here —
    # not only in session.get_spark — because the grading driver builds its
    # own vanilla SparkSession.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # integer division: ns -> us without a double round-trip
            # (1.7e18 ns exceeds double's 2^53 exact-integer range)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Defensive: if a future reader path still yields NTZ, normalize to LTZ
    # (session tz is UTC everywhere the engine runs, so values are unchanged).
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
