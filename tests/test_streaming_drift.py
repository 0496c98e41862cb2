"""Streaming PSI drift monitor: baseline fit, windowed scoring, alarm."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def baseline(spark):
    """Train on a uniform-ish batch over [0, 100)."""
    from spark_streaming_invoice_anomaly_detection_spark.streaming.drift import (
        histogram_baseline,
    )

    df = spark.range(0, 2000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    b = histogram_baseline(df, "v", bins=20)
    assert b.v_lo == 0.0 and b.v_hi == 99.0
    assert b.total == 2000
    assert all(c > 0 for c in b.counts)
    return b


@pytest.mark.slow
def test_psi_monitor_alarms_on_shifted_window(spark, tmp_path, baseline):
    """Window 1 repeats the training distribution (PSI ~ 0, no alarm);
    window 2 concentrates all mass in the top bins (PSI large, alarm)."""
    from spark_streaming_invoice_anomaly_detection_spark.streaming.drift import (
        psi_drift_monitor,
        psi_py,
    )

    src = tmp_path / "in"
    os.makedirs(src)
    with open(src / "w1.csv", "w") as f:  # minute 0: uniform, like training
        for i in range(400):
            f.write(f"2024-01-01 00:00:{i % 50:02d},{float(i % 100)}\n")
    with open(src / "w2.csv", "w") as f:  # minute 1: all mass >= 95
        for i in range(400):
            f.write(f"2024-01-01 00:01:{i % 50:02d},{95.0 + (i % 5)}\n")
    raw = (
        spark.readStream.format("csv")
        .schema("ts timestamp, v double")
        .load(str(src))
    )
    out: list = []
    q = (
        psi_drift_monitor(raw, baseline, "v", "ts", window="1 minute")
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, _e: (out.clear(), out.extend(df.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    assert len(out) == 2
    by_start = {r["window_start"].minute: r for r in out}
    calm, drifted = by_start[0], by_start[1]
    assert calm["n"] == 400 and drifted["n"] == 400
    assert calm["psi_bits"] < 0.05 and not calm["alarm"]
    assert drifted["psi_bits"] > 1.0 and drifted["alarm"]

    # bit-exact vs the pure-Python twin, from the known window contents
    w1_counts = [20] * 20  # 400 uniform values over 20 bins
    w2_counts = [0] * 19 + [400]
    assert calm["psi_bits"] == psi_py(w1_counts, baseline)
    assert drifted["psi_bits"] == psi_py(w2_counts, baseline)


def test_histogram_baseline_degenerate_single_value(spark):
    """All-identical training values: one bin carries everything and the
    monitor's bin expression stays total (no divide-by-zero)."""
    from spark_streaming_invoice_anomaly_detection_spark.streaming.drift import (
        histogram_baseline,
        psi_py,
    )

    df = spark.range(0, 10).selectExpr("CAST(7.5 AS DOUBLE) AS v")
    b = histogram_baseline(df, "v", bins=20)
    assert b.v_lo == b.v_hi == 7.5
    assert b.counts[0] == 10 and sum(b.counts) == 10
    # identical window -> PSI within the fp_log2 floor envelope of zero
    assert abs(psi_py([10] + [0] * 19, b)) < 0.05
