"""AggregateView: additive merge correctness, epoch idempotence, and the
streaming end-to-end loop over a file source."""

from __future__ import annotations

import os
import time

import pytest

from spark_streaming_invoice_anomaly_detection_spark.streaming.materialized import (
    AggregateView,
)


@pytest.fixture()
def view(spark, tmp_path):
    return AggregateView(
        spark, str(tmp_path / "view"), keys=["k"], value_col="v"
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


class TestMergeSemantics:
    def test_two_batches_equal_one(self, spark, view):
        view.merge_batch(_df(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]), 0)
        view.merge_batch(_df(spark, [("a", 4.0), ("c", 7.0)]), 1)
        got = {r.k: (r.n, r.total) for r in view.current().collect()}
        assert got == {"a": (3, 7.0), "b": (1, 5.0), "c": (1, 7.0)}

    def test_epoch_replay_is_noop(self, spark, view):
        b = _df(spark, [("a", 1.0)])
        view.merge_batch(b, 0)
        view.merge_batch(b, 0)  # crash-replay of the same epoch
        view.merge_batch(b, 1)
        got = {r.k: (r.n, r.total) for r in view.current().collect()}
        assert got == {"a": (2, 2.0)}
        assert view.last_epoch() == 1

    def test_empty_view_reads_empty(self, view):
        assert view.current().count() == 0
        assert view.last_epoch() == -1


@pytest.mark.slow
def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    view = AggregateView(
        spark, str(tmp_path / "view"), keys=["k"], value_col="v"
    )
    raw = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", "1")
        .csv(str(src))
    )
    q = (
        raw.writeStream.foreachBatch(view.sink())
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        (src / "b0.csv").write_text("a,1.0\na,2.0\nb,5.0\n")
        (src / "b1.csv").write_text("a,4.0\nc,7.0\n")
        deadline = time.time() + 90
        got = {}
        while time.time() < deadline:
            got = {r.k: (r.n, r.total) for r in view.current().collect()}
            if got == {"a": (3, 7.0), "b": (1, 5.0), "c": (1, 7.0)}:
                break
            time.sleep(1)
        assert got == {"a": (3, 7.0), "b": (1, 5.0), "c": (1, 7.0)}
    finally:
        q.stop()
