"""T4: sliding-window cancellation count (InvoicePipeline.scala:322-331).

The reference windows by processing time (DStream window over 8 min / 1 min
slides). Structured Streaming windows are column-driven, so the pipeline
stamps emitted invoices with their emit wall-clock (``last_updated``) and
windows on that — same semantics, plus the option to window on a real
event-time column with a watermark (the reference has none — SURVEY.md §7
hard-point 7 — so watermarking stays opt-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_count(
    df: DataFrame,
    ts_col: str,
    window: str = "8 minutes",
    slide: str = "1 minute",
    watermark: str | None = None,
) -> DataFrame:
    """Count rows per sliding window; one row per (window, count).

    Output: ``window_start timestamp, window_end timestamp, n long`` —
    the reference publishes just the bare count string per slide
    (InvoicePipeline.scala:324-331); window bounds are kept for sinks that
    want them and dropped at publish time.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )
