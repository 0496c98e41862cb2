"""Hot model reload: the serving side picks up a republished detector
without a stream restart (reference requires restarting the pipeline)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.ml.clustering import (
    detect_anomalies,
    distance_to_centroid,
)
from spark_streaming_invoice_anomaly_detection_spark.streaming.model_reload import (
    ReloadableDetector,
    publish_detector,
    read_version,
)

from .test_streaming_composed import _tiny_detector


def test_version_stamp_and_reload(spark, tmp_path):
    det1 = _tiny_detector(spark, threshold=100.0)
    path = str(tmp_path / "det")
    publish_detector(det1, path, version=1)
    assert read_version(path) == 1

    handle = ReloadableDetector(path)
    got1 = handle.current(spark)
    assert got1.threshold == 100.0
    first_obj = handle.current(spark)
    assert first_obj is got1  # same version -> no reload, same object

    det2 = _tiny_detector(spark, threshold=5.0)
    publish_detector(det2, path, version=2)
    got2 = handle.current(spark)
    assert got2.threshold == 5.0
    assert got2 is not got1  # version change -> fresh load


def test_missing_model_raises(spark, tmp_path):
    handle = ReloadableDetector(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        handle.current(spark)


@pytest.mark.slow
def test_stream_picks_up_new_threshold_mid_flight(spark, tmp_path):
    """A scoring stream flips its anomaly verdict after the trainer
    republishes with a tighter threshold — no query restart."""
    path = str(tmp_path / "det")
    # v1: generous threshold -> nothing is anomalous
    publish_detector(_tiny_detector(spark, threshold=1e12), path, version=1)
    handle = ReloadableDetector(path)

    src = tmp_path / "in"
    os.makedirs(src)
    emitted: list[tuple[int, int]] = []  # (batch_id, n_anomalies)

    def score(df, batch_id):
        det = handle.current(spark)
        feats = df.select(
            F.col("value").cast("double").alias("avg_unit_price"),
            F.lit(1.0).alias("min_unit_price"),
            F.lit(2.0).alias("max_unit_price"),
            F.lit(8.0).alias("time"),
            F.lit(5.0).alias("number_items"),
        )
        from spark_streaming_invoice_anomaly_detection_spark.ml.clustering import (
            assemble_features,
        )

        scored = distance_to_centroid(assemble_features(feats), det.model)
        n = detect_anomalies(scored, det.threshold).count()
        emitted.append((batch_id, n))

    raw = spark.readStream.format("text").load(str(src))
    q = (
        raw.writeStream.outputMode("append")
        .foreachBatch(score)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        (src / "b0.txt").write_text("5000.0\n")
        deadline = time.time() + 60
        while time.time() < deadline and not emitted:
            time.sleep(0.5)
        assert emitted and emitted[-1][1] == 0  # generous threshold: clean

        # trainer republishes a tight threshold; next batch must flag
        publish_detector(_tiny_detector(spark, threshold=1.0), path, version=2)
        n_before = len(emitted)
        (src / "b1.txt").write_text("5000.0\n")
        deadline = time.time() + 60
        while time.time() < deadline and len(emitted) <= n_before:
            time.sleep(0.5)
        assert emitted[-1][1] == 1  # reloaded threshold flags the outlier
    finally:
        q.stop()


def test_publish_retains_previous_version_for_inflight_readers(spark, tmp_path):
    """A publish must never disturb the previous version's files (an
    in-flight reader may still be loading them); versions beyond the
    retention window are cleaned up."""
    path = str(tmp_path / "det")
    for v in (1, 2, 3):
        publish_detector(_tiny_detector(spark, threshold=float(v)), path, version=v)
        if v > 1:  # previous version dir still fully present after publish
            assert os.path.exists(os.path.join(path, f"v{v-1}", "detector.json"))
    assert read_version(path) == 3
    assert not os.path.exists(os.path.join(path, "v1"))  # beyond retain=2
