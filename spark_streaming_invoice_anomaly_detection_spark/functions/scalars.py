"""Native-expression rewrites of the reference's scalar closures.

F1 ``extractHour`` (reference InvoicePipeline.scala:495-498) and F2
``gethour`` UDF (Clustering.scala:24-32) both extract the hour-of-day from a
``'M/d/yyyy H:mm'`` string, yielding -1.0 on any failure. F3-F6 are
null/empty tests, prefix tests, safe casts, and concat — all of which Spark
has as codegen'd built-ins, so the rebuild has zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference date format (scripts/check_csv.py:19): '7/19/2011 12:19'.
INVOICE_DATE_FMT = "M/d/yyyy H:mm"


def extract_hour(date_str: Column | str) -> Column:
    """Hour-of-day as double; -1.0 when the date doesn't parse.

    Mirrors F1/F2 (InvoicePipeline.scala:495-498, Clustering.scala:24-32):
    both return -1.0 as the sentinel for a missing/invalid date, which the
    validation cascade later reports as "invalid invoice date".
    """
    col = F.col(date_str) if isinstance(date_str, str) else date_str
    ts = F.try_to_timestamp(col, F.lit(INVOICE_DATE_FMT))
    return F.coalesce(F.hour(ts).cast("double"), F.lit(-1.0))


def is_empty(col: Column | str) -> Column:
    """StringUtils.isEmpty — null OR empty string (InvoicePipeline.scala:273,279)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c == F.lit(""))


def is_cancellation(invoice_no: Column | str) -> Column:
    """InvoiceNo prefix 'C' marks a cancellation (InvoicePipeline.scala:320)."""
    c = F.col(invoice_no) if isinstance(invoice_no, str) else invoice_no
    return c.startswith("C")


def try_int(col: Column | str) -> Column:
    """Safe int cast: null on failure (replaces .toInt + catch at :96)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def try_double(col: Column | str) -> Column:
    """Safe double cast: null on failure (replaces .toDouble + catch at :98)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")
