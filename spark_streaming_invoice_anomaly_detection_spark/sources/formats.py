"""Columnar interchange formats beyond parquet: ORC (built into Spark) and
Avro (external module, gated).

The reference reads CSV and Kafka only; a general engine must also speak
the other lake formats in place. ORC gets first-class support — Spark
bundles the reader/writer and its scan supports the same predicate
pushdown + column pruning as parquet (verified by plan test). Avro ships
in Spark as an EXTERNAL module (`spark-avro_2.13` must be on the
classpath — it is not in this environment), so the Avro helpers probe for
the datasource and raise a clear error naming the missing jar rather than
failing deep inside the planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC write with the same semantics as the parquet path (snappy by
    Spark default; statistics per stripe enable min/max skipping)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — filters and projections push down exactly like parquet
    (``PushedFilters`` in the FileScan node)."""
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True iff the avro DATASOURCE resolves. Probing the class alone is
    wrong: Spark's main jars carry avro helper classes while the
    registered datasource still requires the external module, so the
    probe asks the planner itself (a missing-path error means the format
    resolved; a failed-to-find-data-source error means it did not)."""
    try:
        spark.read.format("avro").schema("probe int").load(
            "/nonexistent/__avro_probe__"
        )
        return True
    except Exception as e:  # noqa: BLE001 - classify by error condition
        # Spark's standard lookup failure is errorClass DATA_SOURCE_NOT_FOUND
        # ("Failed to find THE data source"); the avro-specific legacy
        # message omits "the". Match the condition name when exposed, plus
        # both message variants, so a build that reroutes the avro lookup
        # through the standard path still classifies correctly.
        cond = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        if cond is not None:
            try:
                if cond() == "DATA_SOURCE_NOT_FOUND":
                    return False
            except Exception:  # noqa: BLE001
                pass
        msg = str(e)
        return (
            "Failed to find data source" not in msg
            and "Failed to find the data source" not in msg
        )


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro write; raises with the exact missing dependency when the
    external module is absent (``--packages org.apache.spark:
    spark-avro_2.13:<spark-version>``)."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro external module not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro external module not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    return spark.read.format("avro").load(path)




def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under DIFFERENT
    schema versions (columns added over time), unioning the schemas.

    ``mergeSchema`` makes the scan reconcile every file footer instead of
    sampling one: rows from files that predate a column read it as null.
    This is the read half of schema evolution on a plain parquet lake —
    the write half is simply "writers may add nullable columns". Merge is
    footer-metadata work at planning time; at 100 TB, listing/footer cost
    scales with file count (another reason compaction matters), not data
    size. Incompatible type changes still fail loudly — correct behavior,
    not a gap.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_with_manifest(df: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """Write parquet plus a ``_manifest.json`` recording row count, schema,
    and an order-insensitive content hash; returns the manifest dict.

    The hash is SUM(xxhash64(all columns)) accumulated in decimal(38,0) —
    exact, commutative, and mergeable, so it computes in one distributed
    aggregate with no ordering requirement and stays stable across
    partitioning/shuffle/AQE differences. This is the provenance record a
    training run pins ("trained on exactly this data"): re-verification
    is one scan, not a byte-compare.
    """
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    df.write.mode(mode).parquet(path)
    back = df.sparkSession.read.parquet(path)
    row = back.agg(
        _F.count(_F.lit(1)).alias("rows"),
        _F.sum(
            _F.xxhash64(*[_F.col(c) for c in sorted(back.columns)]).cast(
                "decimal(38,0)"
            )
        ).alias("content_hash"),
    ).first()
    manifest = {
        "rows": row["rows"],
        "content_hash": str(row["content_hash"]),
        "schema": _json.loads(back.schema.json()),
    }
    with open(_os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> dict:
    """Recompute the manifest over what's on disk and compare; returns
    {'ok': bool, 'expected': ..., 'actual': ...}. Catches lost/extra/
    modified files that a row count alone would miss."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    with open(_os.path.join(path, "_manifest.json")) as f:
        expected = _json.load(f)
    df = spark.read.parquet(path)
    row = df.agg(
        _F.count(_F.lit(1)).alias("rows"),
        _F.sum(
            _F.xxhash64(*[_F.col(c) for c in sorted(df.columns)]).cast(
                "decimal(38,0)"
            )
        ).alias("content_hash"),
    ).first()
    actual = {"rows": row["rows"], "content_hash": str(row["content_hash"])}
    ok = (
        actual["rows"] == expected["rows"]
        and actual["content_hash"] == expected["content_hash"]
    )
    return {"ok": ok, "expected": expected, "actual": actual}


__all__ = [
    "avro_available",
    "read_avro",
    "read_merged_schema",
    "read_orc",
    "verify_manifest",
    "write_avro",
    "write_orc",
    "write_with_manifest",
]
