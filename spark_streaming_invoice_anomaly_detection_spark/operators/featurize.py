"""Invoice featurization — the engine's flagship aggregation (SURVEY.md A1/P8).

Reference: ``Clustering.featurizeData`` (Clustering.scala:45-58) groups
purchase lines by InvoiceNo and computes
``avg/min/max(UnitPrice), max(Hour) as Time, sum(Quantity), max(InvoiceDate),
count(*), first(CustomerID)``; ``filterData`` (Clustering.scala:60-67) keeps
rows with a CustomerID, a LastDate, and no 'C' (cancellation) prefix.

Spark-first notes: this is a single hash aggregation — Catalyst plans a
partial (map-side) agg before the shuffle, so at 100 TB the shuffle carries
one row per invoice per mapper, not one per line. ``first(CustomerID)`` is
nondeterministic in a distributed agg (SURVEY.md §7 hard-point 5), so the
oracle-checked variant uses ``min`` — documented, deliberate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import extract_hour, is_cancellation


def featurize_invoices(lines: DataFrame, deterministic: bool = True) -> DataFrame:
    """Purchase lines -> one feature row per invoice (A1).

    ``deterministic=True`` swaps the reference's ``first(CustomerID)``
    (Clustering.scala:55) for ``min`` so results are stable across
    partitionings — required for oracle comparison and for reproducible
    training at scale.
    """
    customer = (
        F.min("customer_id") if deterministic else F.first("customer_id", ignorenulls=True)
    )
    return (
        lines.withColumn("hour", extract_hour("invoice_date"))
        .groupBy("invoice_no")
        .agg(
            F.avg("unit_price").alias("avg_unit_price"),
            F.min("unit_price").alias("min_unit_price"),
            F.max("unit_price").alias("max_unit_price"),
            F.max("hour").alias("time"),
            F.sum("quantity").alias("number_items"),
            F.max("invoice_date").alias("last_updated"),
            F.count(F.lit(1)).alias("lines"),
            customer.alias("customer_id"),
        )
    )


def filter_valid_invoices(invoices: DataFrame) -> DataFrame:
    """Training validity filter (P8, Clustering.scala:60-67).

    CustomerID NOT NULL and LastDate NOT NULL and not a cancellation. The
    batch reference checks only ``isNotNull`` — empty-string CustomerIDs are
    kept and trained on; the null-OR-empty test belongs to the *streaming*
    cascade (StringUtils.isEmpty at InvoicePipeline.scala:273), not here.
    A plain conjunctive predicate: Catalyst pushes it below column-derived
    projects and into the scan where possible.
    """
    return invoices.filter(
        F.col("customer_id").isNotNull()
        & F.col("last_updated").isNotNull()
        & ~is_cancellation("invoice_no")
    )
