"""S2/S3 live round-trip, gated on the environment actually having the
pieces: the spark-sql-kafka connector jar AND a reachable broker.

This sandbox ships neither (no jar in $SPARK_HOME/jars, no broker, no
network installs), so both gates skip here with the exact missing piece
named — the test is green-or-skipped by construction, never red. On a
machine with `--packages org.apache.spark:spark-sql-kafka-0-10_2.13` and a
localhost broker it runs the full produce → consume → parse path that
tests/test_sources.py can only unit-test at the option/wire-format level.
"""

from __future__ import annotations

import socket
import time
import uuid

import pytest


def _kafka_jar_available(spark) -> bool:
    """True iff the kafka DataSource class resolves in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _broker_reachable(host: str = "localhost", port: int = 9092) -> bool:
    try:
        with socket.create_connection((host, port), timeout=1):
            return True
    except OSError:
        return False


BROKERS = "localhost:9092"


def test_kafka_roundtrip_when_available(spark, tmp_path):
    if not _kafka_jar_available(spark):
        pytest.skip(
            "spark-sql-kafka connector jar not on the JVM classpath "
            "(org.apache.spark.sql.kafka010.KafkaSourceProvider unresolvable; "
            "no network installs in this sandbox)"
        )
    if not _broker_reachable():
        pytest.skip("no Kafka broker reachable at localhost:9092")

    from spark_streaming_invoice_anomaly_detection_spark.sources.kafka import (
        kafka_sink_options,
        read_kafka_lines,
        wire_format,
    )

    topic = f"invoices-test-{uuid.uuid4().hex[:8]}"
    lines = [
        "536365,85123A,X,6,12/1/2010 8:26,2.55,17850,United Kingdom",
        "536366,22633,Y,6,12/1/2010 8:28,1.85,17850,United Kingdom",
    ]

    # produce (batch write through the same wire-format projection the
    # streaming sink uses)
    src = spark.createDataFrame([(ln,) for ln in lines], "value string")
    writer = wire_format(src).write.format("kafka")
    for k, v in kafka_sink_options(BROKERS, topic).items():
        writer = writer.option(k, v)
    writer.save()

    # consume via the engine's streaming source, from the beginning
    stream = read_kafka_lines(spark, BROKERS, topic, starting_offsets="earliest")
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM kafka_rt").first()[0] >= len(lines):
                break
            time.sleep(1)
        got = sorted(r.value for r in spark.sql("SELECT value FROM kafka_rt").collect())
        assert got == sorted(lines)
    finally:
        q.stop()
