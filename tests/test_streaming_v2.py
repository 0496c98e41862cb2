"""transformWithState sessionizer (session_state_v2) pinned to the same
semantic contract as the applyInPandasWithState default.

The transformWithState runtime needs ``google.protobuf`` (its state-server
wire protocol); this container does not ship it, so the end-to-end query
test auto-skips where the import fails. The processor's semantics (append /
error-discards-batch / clock reset / emit-once finalize) do not depend on
that runtime and are pinned here directly against fakes.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from spark_streaming_invoice_anomaly_detection_spark.streaming.session_state_v2 import (
    make_processor,
)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# Fakes standing in for the transformWithState runtime
# ---------------------------------------------------------------------------


class FakeValueState:
    def __init__(self):
        self._v = None
        self._set = False

    def exists(self):
        return self._set

    def get(self):
        return self._v

    def update(self, v):
        self._v, self._set = v, True

    def clear(self):
        self._v, self._set = None, False


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return iter(list(self.timers))


class FakeTimerValues:
    def __init__(self, now_ms=1_000_000):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


def _batch(rows):
    cols = [
        "invoice_no",
        "quantity",
        "invoice_date",
        "unit_price",
        "customer_id",
        "country",
        "error_reason",
    ]
    return pd.DataFrame(rows, columns=cols)


GOOD = ("536365", 6, "12/1/2010 8:26", 2.55, "17850", "United Kingdom", None)
GOOD2 = ("536365", 4, "12/1/2010 9:27", 10.45, "17850", "United Kingdom", None)
ERR = ("536365", None, None, None, None, None, "parse error: bad qty")


class TestProcessorSemantics:
    def _proc(self, timeout_ms=2000):
        proc = make_processor(timeout_ms)
        handle = FakeHandle()
        proc.init(handle)
        return proc, handle

    def test_goods_append_and_timer_reset(self):
        proc, handle = self._proc()
        out = list(
            proc.handleInputRows(
                ("536365",), iter([_batch([GOOD])]), FakeTimerValues(1000)
            )
        )
        assert out == []  # nothing emits on input
        assert handle.timers == [3000]  # now + timeout
        out = list(
            proc.handleInputRows(
                ("536365",), iter([_batch([GOOD2])]), FakeTimerValues(2000)
            )
        )
        assert handle.timers == [4000]  # old timer dropped, clock reset
        q, d, p, c, co, err = handle.state.get()
        assert q == [6, 4] and p == [2.55, 10.45] and err is None

    def test_error_discards_batch_goods(self):
        # reference :210-219 — an error event wins the whole batch
        proc, handle = self._proc()
        list(
            proc.handleInputRows(
                ("536365",),
                iter([_batch([GOOD, ERR])]),
                FakeTimerValues(1000),
            )
        )
        q, d, p, c, co, err = handle.state.get()
        assert q == [] and p == []  # goods in the error batch discarded
        assert err == "parse error: bad qty"
        assert handle.timers == [3000]  # errors still reset the clock

    def test_expiry_finalizes_first_line_hour_and_clears(self):
        proc, handle = self._proc()
        list(
            proc.handleInputRows(
                ("536365",),
                iter([_batch([GOOD, GOOD2])]),
                FakeTimerValues(1000),
            )
        )
        out = list(proc.handleExpiredTimer(("536365",), FakeTimerValues(3000), None))
        assert len(out) == 1
        row = out[0].iloc[0]
        assert row.lines == 2
        assert row.avg_unit_price == pytest.approx((2.55 + 10.45) / 2)
        assert row.time == 8.0  # FIRST line's hour (toInvoice quirk)
        assert row.number_items == 10.0
        assert not handle.state.exists()  # emit once, then drop

    def test_error_only_invoice_emits_zero_lines(self):
        proc, handle = self._proc()
        list(
            proc.handleInputRows(
                ("536365",), iter([_batch([ERR])]), FakeTimerValues(1000)
            )
        )
        row = list(
            proc.handleExpiredTimer(("536365",), FakeTimerValues(3000), None)
        )[0].iloc[0]
        assert row.lines == 0
        assert row.error_reason == "parse error: bad qty"
        assert pd.isna(row.avg_unit_price)


# ---------------------------------------------------------------------------
# End-to-end (needs the protobuf-backed state server)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.skipif(
    not _protobuf_available(),
    reason="pyspark.sql.streaming.proto.StateMessage_pb2 (transformWithState"
    " wire protocol) needs google.protobuf — absent, not installable here; "
    "see session_state_v2 module docstring",
)
def test_v2_end_to_end(spark, tmp_path):
    from spark_streaming_invoice_anomaly_detection_spark.session import (
        enable_rocksdb_state_store,
    )
    from spark_streaming_invoice_anomaly_detection_spark.streaming.parse import (
        parse_purchase_lines,
        route_events,
    )
    from spark_streaming_invoice_anomaly_detection_spark.streaming.session_state_v2 import (
        sessionize_invoices_v2,
    )

    src = tmp_path / "in"
    os.makedirs(src, exist_ok=True)
    previous = enable_rocksdb_state_store(spark)
    try:
        raw = spark.readStream.format("text").load(str(src))
        invoices = sessionize_invoices_v2(
            route_events(parse_purchase_lines(raw)), 1, 2
        )
        q = (
            invoices.writeStream.format("memory")
            .queryName("v2_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(processingTime="1 seconds")
            .start()
        )
        try:
            (src / "b0.txt").write_text(
                "536365,85123A,X,6,12/1/2010 8:26,2.55,17850,United Kingdom"
            )
            deadline = time.time() + 120
            while time.time() < deadline:
                if spark.sql("SELECT count(*) FROM v2_out").first()[0] >= 1:
                    break
                time.sleep(1)
            rows = spark.sql("SELECT * FROM v2_out").collect()
            assert len(rows) == 1 and rows[0].invoice_no == "536365"
        finally:
            q.stop()
    finally:
        if previous is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", previous
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
