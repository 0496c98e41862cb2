"""End-to-end streaming pipeline: parse -> sessionize -> fan out to 4 sinks.

Reference graph (InvoicePipeline.scala:157-409): Kafka lines -> safeParseCsv
-> split/union -> updateStateByKey -> expired filter -> {erroneous,
cancellation window count, kmeans anomalies, bisect anomalies} -> 4 Kafka
topics.

Structured Streaming shape: ONE stateful query; the four consumers run
inside ``foreachBatch`` over the emitted-invoice micro-batch with a single
``persist()`` — the SS equivalent of the reference's
``completedInvoices.cache()`` fan-out (T5; four independent writeStream
queries would each re-run the state store).

Anomaly scoring (M4-M6) reuses the batch scorer: broadcast centroid join +
native arithmetic — models ship to executors once per batch via the
broadcast join, mirroring the reference's model broadcast (:148-152).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..ml.clustering import Detector, detect_anomalies, distance_to_centroid
from .parse import parse_purchase_lines, route_events
from .session_state import sessionize_invoices
from .validate import classify_erroneous, filter_valid_invoices

SinkFn = Callable[[DataFrame, int], None]

FEATURE_ORDER = [
    "avg_unit_price",
    "min_unit_price",
    "max_unit_price",
    "time",
    "number_items",
]


def score_anomalies(invoices: DataFrame, detector: Detector) -> DataFrame:
    """Valid non-cancellation invoices -> anomaly invoice numbers (M4-M6)."""
    from ..ml.clustering import assemble_features

    feats = assemble_features(invoices, FEATURE_ORDER)
    scored = distance_to_centroid(feats, detector.model)
    return detect_anomalies(scored, detector.threshold).select("invoice_no", "dist")


@dataclass
class PipelineSinks:
    """Per-output delivery callables (DataFrame, epoch_id) -> None.

    Defaults collect into driver-side lists — test/dev only; production
    wires kafka_sink from sources.kafka.
    """

    erroneous: SinkFn
    cancellations: SinkFn
    kmeans_anomalies: SinkFn
    bisect_anomalies: SinkFn


@dataclass
class CollectingSinks:
    """In-memory sinks for tests: rows accumulate per output."""

    erroneous: list = field(default_factory=list)
    cancellations: list = field(default_factory=list)
    kmeans_anomalies: list = field(default_factory=list)
    bisect_anomalies: list = field(default_factory=list)

    def as_sinks(self) -> PipelineSinks:
        return PipelineSinks(
            erroneous=lambda df, _e: self.erroneous.extend(df.collect()),
            cancellations=lambda df, _e: self.cancellations.extend(df.collect()),
            kmeans_anomalies=lambda df, _e: self.kmeans_anomalies.extend(df.collect()),
            bisect_anomalies=lambda df, _e: self.bisect_anomalies.extend(df.collect()),
        )


def build_invoice_stream(
    raw_lines: DataFrame,
    trigger_seconds: int = 20,
    expiry_ticks: int = 2,
) -> DataFrame:
    """Raw text lines (streaming) -> finalized-invoice stream."""
    parsed = parse_purchase_lines(raw_lines)
    events = route_events(parsed)
    return sessionize_invoices(events, trigger_seconds, expiry_ticks)


def start_pipeline(
    raw_lines: DataFrame,
    sinks: PipelineSinks,
    kmeans: Detector | None = None,
    bisect: Detector | None = None,
    trigger_seconds: int = 20,
    expiry_ticks: int = 2,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Wire the full pipeline and start it (one query, foreachBatch fan-out)."""
    invoices = build_invoice_stream(raw_lines, trigger_seconds, expiry_ticks)

    def fan_out(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            sinks.erroneous(classify_erroneous(batch), epoch_id)

            valid = filter_valid_invoices(batch).persist()
            cancels = valid.filter(F.col("invoice_no").startswith("C"))
            # per-batch count; the 8min/1min sliding view is windows.sliding
            # _count over the stamped emit time, applied by the sink/consumer
            sinks.cancellations(
                cancels.select("invoice_no", "last_updated"), epoch_id
            )

            candidates = valid.filter(~F.col("invoice_no").startswith("C"))
            if kmeans is not None:
                sinks.kmeans_anomalies(score_anomalies(candidates, kmeans), epoch_id)
            if bisect is not None:
                sinks.bisect_anomalies(score_anomalies(candidates, bisect), epoch_id)
            valid.unpersist()
        finally:
            batch.unpersist()

    writer = (
        invoices.writeStream.outputMode("append")
        .foreachBatch(fan_out)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
