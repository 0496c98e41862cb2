"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
reference's purchase-line CSV as a first-class ``spark.read.format(...)``
connector.

Why it exists: S1/S8 adapters cover the standard loaders; this shows the
engine can also own a *connector* — schema declaration, file-level
partition planning, per-partition reads, and a replayable streaming
reader with line-offset checkpointing (``PurchaseReplayStreamReader``) —
entirely in Python, the Spark-4 route for sources with no JVM
implementation (internal formats, feeds behind Python SDKs).

Scope note: rows cross the Python boundary one at a time, so this is a
CONNECTOR surface, not the hot path — the engine's bulk I/O stays on the
vectorized parquet/CSV readers. Parsing reuses the same safe-parse
taxonomy as streaming/parse.py (malformed lines yield an error_reason, not
an exception), so a file read through this source routes through the same
downstream validation.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Directory listing patterns (comma-separated globs) shared by the batch
#: and streaming readers: covers hand-written .csv chunks AND the paced
#: producer's chunk_NNNNNN.txt files, while excluding stray non-data files
#: (manifests, logs, editor backups) that would otherwise be parsed as
#: purchase lines. Override with .option("pattern", ...).
DEFAULT_FILE_PATTERN = "*.csv,*.txt"


def _list_data_files(path: str, pattern: str) -> list[str]:
    import glob
    import os

    if not os.path.isdir(path):
        return [path]
    out: set[str] = set()
    for pat in pattern.split(","):
        pat = pat.strip()
        if pat:
            out.update(glob.glob(os.path.join(path, pat)))
    return sorted(f for f in out if os.path.isfile(f))


#: Output schema: the typed purchase line + parse-error column (P1).
PURCHASE_CSV_SCHEMA = (
    "invoice_no string, quantity int, invoice_date string, "
    "unit_price double, customer_id string, country string, "
    "error_reason string"
)


class PurchaseCsvDataSource(DataSource):
    """``spark.read.format("purchase_csv").option("path", dir).load()``.

    Options: ``path`` (file or directory), ``pattern`` (comma-separated
    globs for directory listing, default ``*.csv,*.txt`` — covers both
    hand-written chunks and the paced producer's ``chunk_NNNNNN.txt``),
    ``header`` ("true"/"false", default false — the reference's replay
    files carry no header; when true, one header per file is dropped by
    BOTH the batch and streaming readers).
    """

    @classmethod
    def name(cls) -> str:
        return "purchase_csv"

    def schema(self) -> str:
        return PURCHASE_CSV_SCHEMA

    def reader(self, schema) -> "PurchaseCsvReader":
        return PurchaseCsvReader(self.options)

    def simpleStreamReader(self, schema) -> "PurchaseReplayStreamReader":
        return PurchaseReplayStreamReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PurchaseCsvReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("purchase_csv: 'path' option is required")
        self.header = str(options.get("header", "false")).lower() == "true"
        self.pattern = options.get("pattern", DEFAULT_FILE_PATTERN)

    def partitions(self):
        # one partition per file: the planning unit a 1000-executor read
        # parallelizes over (a directory of replay chunks fans out)
        files = _list_data_files(self.path, self.pattern)
        if not files:
            raise ValueError(
                f"purchase_csv: no files matching {self.pattern} under {self.path}"
            )
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


class PurchaseReplayStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: the reference's paced replay
    (InvoiceDataProducer.scala:10-45) as a first-class
    ``spark.readStream.format("purchase_csv")`` source.

    ``path`` may be a single append-only file or a directory of chunk
    files (the paced producer's watch-dir layout, replay.py) — directory
    files are consumed in sorted name order, matching the producer's
    monotonically-named atomic chunks.

    Offsets are positions in the virtual concatenation of those lines —
    ``{"line": N, "fname": f, "pos": B}`` (file NAME + byte position make
    resumption O(batch) and immune to strays that sort earlier; the line
    count is the exactly-once contract) —
    so the source is REPLAYABLE: ``readBetweenOffsets(start, end)``
    re-yields exactly the lines in ``[start, end)``, which is what lets a
    restarted query re-run an uncommitted micro-batch from the
    checkpointed offset instead of at-most-once-ing it (the guarantee the
    reference's fire-and-forget Kafka producer does NOT give).

    Tail safety: a final line not yet newline-terminated (a producer's
    unflushed write) is NOT consumed — the offset stops before it and the
    completed line is picked up by a later trigger. Records are parsed
    per line, so quoted commas survive but embedded newlines inside
    quotes do not (the reference wire format has none).

    ``maxLinesPerBatch`` (default 200) bounds each micro-batch — the
    admission-control knob that keeps batch latency flat when the replay
    file is hours of backlog: a bounded slice per trigger instead of the
    whole remaining file in batch 0 (the same role as maxFilesPerTrigger
    / maxOffsetsPerTrigger on the built-in sources).

    The simple-reader variant prefetches on the driver (rows ship to
    executors with the plan) — right for a replay/control source at
    replay rates; a partition-parallel ``DataSourceStreamReader`` is the
    step up when a single driver thread can't keep up.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("purchase_csv: 'path' option is required")
        self.header = str(options.get("header", "false")).lower() == "true"
        self.max_lines = int(options.get("maxLinesPerBatch", 200))
        self.pattern = options.get("pattern", DEFAULT_FILE_PATTERN)

    def initialOffset(self) -> dict:
        # fname keys the position into the SORTED listing by NAME, not by
        # index: a stray or late file that sorts before the committed one
        # cannot shift what the checkpoint points at.
        return {"line": 0, "fname": None, "pos": 0}

    def _files(self) -> list[str]:
        return _list_data_files(self.path, self.pattern)

    @staticmethod
    def _parse_line(line: str):
        import csv as _csv

        row = [c.strip() for c in next(_csv.reader([line]), [])]
        if not row or all(not f for f in row):
            return ("UNKNOWN", None, None, None, None, None, "empty line")
        if len(row) < 8:
            return (row[0], None, None, None, None, None, "malformed purchase line")
        try:
            qty = int(row[3])
            price = float(row[5])
        except ValueError as e:
            return (row[0], None, None, None, None, None, f"parse error: {e}")
        return (row[0], qty, row[4], price, row[6], row[7], None)

    def _read_span(self, start: dict, limit: int | None):
        """Lines from ``start`` (file idx + byte pos), newline-terminated
        only, up to ``limit``. Returns (rows, end_offset). Resumption
        seeks straight to the byte position — per-trigger work is
        O(lines read), not O(lines ever read)."""
        files = self._files()
        rows: list = []
        line_no = start["line"]
        if start.get("fname") is None:
            f_idx, pos = 0, 0
        else:
            try:
                f_idx = files.index(start["fname"])
            except ValueError:
                raise RuntimeError(
                    f"purchase_csv: checkpointed file {start['fname']!r} is "
                    f"no longer present under {self.path} (source must be "
                    "append-only)"
                ) from None
            pos = start["pos"]
        while f_idx < len(files) and (limit is None or len(rows) < limit):
            with open(files[f_idx], "r", encoding="utf-8", newline="") as f:
                f.seek(pos)
                if self.header and pos == 0:
                    # EVERY file's header is skipped (parity with the batch
                    # reader, which drops one header per partition file)
                    first = f.readline()
                    if not first.endswith("\n"):
                        break  # header itself incomplete; wait
                    pos = f.tell()
                while limit is None or len(rows) < limit:
                    line = f.readline()
                    if not line.endswith("\n"):
                        # EOF or an unflushed partial tail: do not consume;
                        # a later trigger re-reads from this position.
                        break
                    rows.append(self._parse_line(line.rstrip("\r\n")))
                    pos = f.tell()
                    line_no += 1
                else:
                    break  # limit reached mid-file
                # fell through: this file is drained (or tail partial).
                # Advance to the next file ONLY if one already exists —
                # chunk files are atomic (rename), so a drained non-final
                # file is complete.
                if f_idx + 1 < len(files):
                    f_idx, pos = f_idx + 1, 0
                else:
                    break
        fname = files[f_idx] if f_idx < len(files) else start.get("fname")
        return rows, {"line": line_no, "fname": fname, "pos": pos}

    def read(self, start: dict):
        rows, end = self._read_span(start, self.max_lines)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_span(start, end["line"] - start["line"])
        return iter(rows)


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(PurchaseCsvDataSource)
