"""Co-grouped Arrow-batched operators (``groupBy().cogroup().applyInPandas``).

The cogroup surface is Spark's answer to per-key algorithms that need BOTH
sides of a join materialized together (merge_asof, windowed attribution,
per-key reconciliation): each side shuffles ONCE on the key, and the pandas
function sees the two aligned groups without a row-multiplying join. For a
time-range count per order ("events in the 7 days before the order"), a
plain range join multiplies rows (orders x matching events) before
re-aggregating; the cogrouped form counts inside the group with two
binary searches per order — O(n log n) per key, no intermediate blow-up,
and per-key memory bounded by that key's rows (the property that matters
when a 100 TB corpus shuffles onto 1000 executors).

No reference counterpart (the reference has no joins, SURVEY.md §2.3 note);
this generalizes the asof/range-join family to arbitrary per-key logic.

The pandas function is defined INSIDE the operator builder so cloudpickle
serializes it by value: the grading driver's Python workers do not have
this package on their import path, so a module-level function (pickled by
reference) would fail with ModuleNotFoundError on the executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OUT_SCHEMA = "o_orderkey long, n_events_7d long"


def event_attribution(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-order count of the user's events in the 7 days up to the order.

    ``events`` needs (user_id, ts); ``orders`` needs (o_custkey, o_orderkey,
    o_orderdate). Orders whose user has no events are kept with count 0
    (left-outer semantics — the cogroup delivers the order group with an
    empty event side).
    """

    def count_recent(events_pdf, orders_pdf):
        # worker-side: keep all imports/constants local (pickled by value)
        import pandas as pd

        window = pd.Timedelta(days=7)
        if orders_pdf.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "n_events_7d": pd.Series(dtype="int64"),
                }
            )
        if events_pdf.empty:
            ts = pd.Series(dtype="datetime64[us]").to_numpy()
        else:
            ts = events_pdf["ts"].sort_values().to_numpy()
        hi = orders_pdf["o_orderdate"].to_numpy()
        lo = hi - window.to_numpy()
        # half-open (lo, hi]: right-side searchsorted at both bounds
        n = ts.searchsorted(hi, side="right") - ts.searchsorted(lo, side="right")
        return pd.DataFrame(
            {"o_orderkey": orders_pdf["o_orderkey"].to_numpy(), "n_events_7d": n}
        )

    # Explicit width on both cogroup inputs: the cost of this stage is
    # per-GROUP Python dispatch, not shuffle bytes, and AQE's byte-based
    # coalescing is blind to that — it squeezed 15k pandas groups onto 3
    # of 32 cores at sf0.1 (measured 23.5 s; ~3 s with the pin). A
    # user-specified repartition is exempt from AQE coalescing, and a
    # matching hash partitioning on the cogroup keys satisfies the
    # operator's required distribution, so no further exchange follows.
    n = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("user_id", "ts")
        .repartition(n, "user_id")
        .groupBy("user_id")
        .cogroup(
            orders.select("o_custkey", "o_orderkey", "o_orderdate")
            .repartition(n, "o_custkey")
            .groupBy("o_custkey")
        )
        .applyInPandas(count_recent, schema=_OUT_SCHEMA)
    )
