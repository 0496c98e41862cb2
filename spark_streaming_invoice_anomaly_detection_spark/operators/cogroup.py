"""Co-grouped Arrow-batched operators (``groupBy().cogroup().applyInArrow``).

The cogroup surface is Spark's answer to per-key algorithms that need BOTH
sides of a join materialized together (merge_asof, windowed attribution,
per-key reconciliation): each side shuffles ONCE on the key, and the
per-group function sees the two aligned groups without a row-multiplying
join. For a time-range count per order ("events in the 7 days before the
order"), a plain range join multiplies rows (orders x matching events)
before re-aggregating; the cogrouped form counts inside the group with two
binary searches per order — O(n log n) per key, no intermediate blow-up,
and per-key memory bounded by that key's rows (the property that matters
when a 100 TB corpus shuffles onto 1000 executors).

r12: the per-group function is ``applyInArrow`` (FlatMapCoGroupsInArrow),
not ``applyInPandas`` — groups cross the Python boundary as Arrow record
batches and the math runs on NumPy views of the Arrow buffers, skipping
the pandas Block/Series construction per group that dominated the
pandas-cogroup floor (guide §4: Arrow batches over pandas rows; measured
on the registered query, see OPTIMIZATION_r12.md).

No reference counterpart (the reference has no joins, SURVEY.md §2.3 note);
this generalizes the asof/range-join family to arbitrary per-key logic.

The per-group function is defined INSIDE the operator builder so
cloudpickle serializes it by value: the grading driver's Python workers do
not have this package on their import path, so a module-level function
(pickled by reference) would fail with ModuleNotFoundError on the executor.
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

    def count_recent(events_tbl, orders_tbl):
        # worker-side: keep all imports/constants local (pickled by value)
        import numpy as np
        import pyarrow as pa

        if orders_tbl.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "n_events_7d": pa.array([], type=pa.int64()),
                }
            )
        if events_tbl.num_rows == 0:
            ts = np.array([], dtype="datetime64[us]")
        else:
            # Arrow timestamp[us] -> datetime64[us] view; sort is the only
            # O(n log n) term, identical to the pandas-path sort_values
            ts = np.sort(
                events_tbl.column("ts").to_numpy(zero_copy_only=False)
            )
        # date32 -> datetime64[D]; numpy aligns units in the comparisons,
        # so (lo, hi] below is the same half-open day-boundary predicate
        hi = orders_tbl.column("o_orderdate").to_numpy(zero_copy_only=False)
        lo = hi - np.timedelta64(7, "D")
        # half-open (lo, hi]: right-side searchsorted at both bounds
        n = ts.searchsorted(hi, side="right") - ts.searchsorted(lo, side="right")
        return pa.table(
            {
                "o_orderkey": orders_tbl.column("o_orderkey"),
                "n_events_7d": pa.array(n.astype("int64"), type=pa.int64()),
            }
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
        .applyInArrow(count_recent, schema=_OUT_SCHEMA)
    )
