"""T2 on the Spark 4 ``transformWithState`` API: the same invoice
sessionization semantics as session_state.py (reference updateInvoiceState,
InvoicePipeline.scala:192-252), expressed as a ``StatefulProcessor`` with
explicit processing-time timers instead of ``GroupStateTimeout``.

Why a second implementation exists: ``applyInPandasWithState`` is the
stable operator and stays the pipeline default; ``transformWithState`` is
Spark's successor API (typed state slots, multiple timers, TTL, initial
state) and is where stateful features land going forward. Keeping both
behind one semantic contract — pinned by the shared test fixture in
tests/test_streaming_v2.py — lets a deployment choose per cluster.

Semantics preserved (same list as session_state.py):
- parse-error events store the reason, reset the inactivity clock, and
  discard goods arriving in the same batch (:210-219)
- goods append + reset the clock (:223-237)
- no events for expiry_ticks * trigger seconds => emit once, drop (:239-246)
- finalization uses the FIRST line's hour/customer (toInvoice, :472-492)

Requires the RocksDB state store provider (transformWithState's only
supported backend): call ``session.enable_rocksdb_state_store`` before
starting the query.

HARD RUNTIME BLOCKER in this build environment (why the one e2e test
skips): PySpark's transformWithStateInPandas worker talks to the JVM
state server through ``pyspark.sql.streaming.proto.StateMessage_pb2``,
whose import requires the ``google.protobuf`` package — verified absent
here (``ModuleNotFoundError: No module named 'google'``) and not
installable (no pip in the sandbox). Everything else is in place: PySpark
4.1.2 ships the operator, the RocksDB provider loads, and
``stateful_processor_api_client`` imports fine up to the proto module.
Environments with protobuf run ``tests/test_streaming_v2.py::
test_v2_end_to_end`` as-is; without it, deployments keep
session_state.sessionize_invoices (the production default), and the
processor's semantics stay pinned runtime-free by the fake-handle tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .session_state import (
    DEFAULT_EXPIRY_TICKS,
    DEFAULT_TRIGGER_SECONDS,
    EMITTED_SCHEMA,
    STATE_SCHEMA,
)


def make_processor(timeout_ms: int):
    """Build the StatefulProcessor class bound to an expiry timeout.

    Defined inside the factory so cloudpickle ships the whole class by
    value — Python workers never import this package (same discipline as
    session_state.make_update_fn).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    state_schema = STATE_SCHEMA
    out_columns = [f.name for f in EMITTED_SCHEMA.fields]

    class InvoiceSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._buf = handle.getValueState("buf", state_schema)

        # -- helpers (duplicated from session_state by design: both
        # operators must stay independently shippable by value) ---------
        @staticmethod
        def _extract_hour(date_str) -> float:
            try:
                return float(date_str.split(" ")[1].split(":")[0])
            except Exception:
                return -1.0

        @staticmethod
        def _is_empty(s) -> bool:
            return s is None or (isinstance(s, float) and pd.isna(s)) or s == ""

        def _finalize(self, inv_no, st) -> pd.DataFrame:
            import time as _time

            quantities, dates, prices, customers, countries, err = st
            n = len(prices)
            if n:
                row = {
                    "invoice_no": inv_no,
                    "avg_unit_price": sum(prices) / n,
                    "min_unit_price": min(prices),
                    "max_unit_price": max(prices),
                    "time": self._extract_hour(dates[0]),
                    "number_items": float(sum(quantities)),
                    "last_updated": int(_time.time() * 1000),
                    "lines": n,
                    "customer_id": customers[0],
                    "error_reason": err,
                    "has_missing_customer": any(
                        self._is_empty(c) for c in customers
                    ),
                    "has_invalid_date": any(
                        self._extract_hour(d) < 0 for d in dates
                    ),
                    "has_missing_country": any(
                        self._is_empty(c) for c in countries
                    ),
                }
            else:
                row = {
                    "invoice_no": inv_no,
                    "avg_unit_price": None,
                    "min_unit_price": None,
                    "max_unit_price": None,
                    "time": None,
                    "number_items": None,
                    "last_updated": int(_time.time() * 1000),
                    "lines": 0,
                    "customer_id": None,
                    "error_reason": err,
                    "has_missing_customer": False,
                    "has_invalid_date": False,
                    "has_missing_country": False,
                }
            return pd.DataFrame([row], columns=out_columns)

        # -- input path --------------------------------------------------
        def handleInputRows(
            self, key, rows, timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            batch = pd.concat(list(rows), ignore_index=True)
            st = (
                self._buf.get()
                if self._buf.exists()
                else ([], [], [], [], [], None)
            )
            quantities, dates, prices, customers, countries, error_reason = (
                list(st[0]),
                list(st[1]),
                list(st[2]),
                list(st[3]),
                list(st[4]),
                st[5],
            )

            errors = batch[batch["error_reason"].notna()]
            if len(errors):
                error_reason = str(errors["error_reason"].iloc[0])
            else:
                goods = batch[batch["error_reason"].isna()]
                quantities += [int(q) for q in goods["quantity"]]
                dates += [d for d in goods["invoice_date"]]
                prices += [float(p) for p in goods["unit_price"]]
                customers += [
                    None if pd.isna(c) else str(c)
                    for c in goods["customer_id"]
                ]
                countries += [
                    None if pd.isna(c) else str(c) for c in goods["country"]
                ]

            self._buf.update(
                (quantities, dates, prices, customers, countries, error_reason)
            )
            # reset the inactivity clock: drop any pending timer, arm a new
            # one (the reference resets ticks on EVERY event, errors incl.)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )
            return iter(())

        # -- expiry path -------------------------------------------------
        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            st = (
                self._buf.get()
                if self._buf.exists()
                else ([], [], [], [], [], None)
            )
            (invoice_no,) = key
            yield self._finalize(invoice_no, st)
            # emit once, then drop (reference :207-208)
            self._buf.clear()

        def close(self) -> None:
            pass

    return InvoiceSessionProcessor()


def sessionize_invoices_v2(
    events: DataFrame,
    trigger_seconds: int = DEFAULT_TRIGGER_SECONDS,
    expiry_ticks: int = DEFAULT_EXPIRY_TICKS,
) -> DataFrame:
    """Keyed purchase/error events -> finalized-invoice stream, on the
    transformWithState operator. Same contract as
    session_state.sessionize_invoices.
    """
    timeout_ms = expiry_ticks * trigger_seconds * 1000
    return events.groupBy("invoice_no").transformWithStateInPandas(
        statefulProcessor=make_processor(timeout_ms),
        outputStructType=EMITTED_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
