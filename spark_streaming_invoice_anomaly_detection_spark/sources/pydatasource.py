"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
reference's purchase-line CSV as a first-class ``spark.read.format(...)``
connector.

Why it exists: S1/S8 adapters cover the standard loaders; this shows the
engine can also own a *connector* — schema declaration, file-level
partition planning, and per-partition reads — entirely in Python, the
Spark-4 route for sources with no JVM implementation (internal formats,
feeds behind Python SDKs).

Scope note: rows cross the Python boundary one at a time, so this is a
CONNECTOR surface, not the hot path — the engine's bulk I/O stays on the
vectorized parquet/CSV readers. Parsing reuses the same safe-parse
taxonomy as streaming/parse.py (malformed lines yield an error_reason, not
an exception), so a file read through this source routes through the same
downstream validation.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Output schema: the typed purchase line + parse-error column (P1).
PURCHASE_CSV_SCHEMA = (
    "invoice_no string, quantity int, invoice_date string, "
    "unit_price double, customer_id string, country string, "
    "error_reason string"
)


class PurchaseCsvDataSource(DataSource):
    """``spark.read.format("purchase_csv").option("path", dir).load()``.

    Options: ``path`` (file or directory of ``*.csv``), ``header``
    ("true"/"false", default false — the reference's replay files carry no
    header).
    """

    @classmethod
    def name(cls) -> str:
        return "purchase_csv"

    def schema(self) -> str:
        return PURCHASE_CSV_SCHEMA

    def reader(self, schema) -> "PurchaseCsvReader":
        return PurchaseCsvReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PurchaseCsvReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("purchase_csv: 'path' option is required")
        self.header = str(options.get("header", "false")).lower() == "true"

    def partitions(self):
        # one partition per file: the planning unit a 1000-executor read
        # parallelizes over (a directory of replay chunks fans out)
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.csv")))
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"purchase_csv: no csv files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        # executes on workers: stdlib-only, shipped by value
        import csv as _csv

        def parse(row):
            if not row or all(not f.strip() for f in row):
                return ("UNKNOWN", None, None, None, None, None, "empty line")
            if len(row) < 8:
                return (
                    row[0] if row else "UNKNOWN",
                    None,
                    None,
                    None,
                    None,
                    None,
                    "malformed purchase line",
                )
            try:
                qty = int(row[3])
                price = float(row[5])
            except ValueError as e:
                return (row[0], None, None, None, None, None, f"parse error: {e}")
            return (row[0], qty, row[4], price, row[6], row[7], None)

        with open(partition.path, newline="", encoding="utf-8") as f:
            reader = _csv.reader(f)
            if self.header:
                next(reader, None)
            for row in reader:
                yield parse([c.strip() for c in row])


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(PurchaseCsvDataSource)
