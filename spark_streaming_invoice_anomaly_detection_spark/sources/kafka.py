"""S2/S3: Kafka source & sink adapters.

Reference used receiver-based Kafka 0.8 (InvoicePipeline.scala:501-511) and
a per-partition producer (:420-432). Structured Streaming's Kafka connector
replaces both: the source is offset-tracked (exactly-once with
checkpointing, no receivers), the sink pools producers.

The spark-sql-kafka jar is not bundled in this environment, so these
builders are thin and unexercised here; tests drive the pipeline through
file/memory sources instead (same DataFrame contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_lines(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka topic(s) -> streaming DataFrame of string lines in ``value``.

    Mirrors connectToPurchases: the Kafka key is dropped (P2, reference
    ``raw.map(_._2)`` at :162).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_sink(topic: str, brokers: str):
    """foreachBatch sink publishing one string column per record.

    The value is the reference's wire format (e.g. "<invoiceNo>,<reason>" —
    :384); key is null, matching the reference producer (:429).
    """

    def write(df: DataFrame, _epoch_id: int) -> None:
        out = df.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns]).alias(
                "value"
            )
        )
        (
            out.write.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .save()
        )

    return write


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """File-based line source (test/replay stand-in for Kafka): each file
    dropped into ``path`` becomes a micro-batch, like the reference's
    simulation producer feeding the topic (InvoiceDataProducer.scala)."""
    return spark.readStream.format("text").load(path)
