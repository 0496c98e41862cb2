"""Benchmark harness (driver contract): run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver-side
row transfer — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from spark_streaming_invoice_anomaly_detection_spark.plans.registry import (
        REGISTRY,
        queries,
    )
    from spark_streaming_invoice_anomaly_detection_spark.session import get_spark

    queries()  # load registry
    spark = get_spark(app_name="invoice-engine-bench")

    headline = [
        "invoice_featurize",        # flagship hash agg (A1)
        "invoice_featurize_valid",  # agg + join + filter (A1+P8)
        "validation_cascade",       # codegen'd CASE cascade (P10)
        "sliding_window_count",     # 8x window expansion + agg (T4)
        "threshold_topk",           # TakeOrdered order statistic (A4)
        "pricing_summary",          # TPC-H Q1 shape
        "join_fact_fact_revenue",   # fact-fact + dim join (Q3 shape)
        "topk_per_group",           # window row_number top-k
        "window_running_sum",       # analytic running agg
        "rollup_qty",               # multi-level aggregation
        # round-2 surface, timed since r3 so regressions are visible:
        "join_five_way_volume",     # TPC-H Q5 shape, dim-broadcast chain
        "top_returning_customers",  # Q10 shape, fact-fact + top-20
        "minhash_lsh_neardups",     # banded-LSH dedup (shuffle-heavy)
        "arrow_text_stats",         # mapInArrow Python-boundary path
        # round-3 surface:
        "bloom_pruned_revenue",     # runtime-filter-shaped fact join
        "quality_calibration_map",  # quality scoring + rollup GK grids
        "dsir_importance_weights",  # gram explode + fp_log2 likelihood ratio
    ]
    headline = [q for q in headline if q in REGISTRY]

    # One untimed warm-up pass: JVM JIT + codegen compilation are one-time
    # costs (~2-6s on first execution of each operator shape) that a
    # long-running cluster amortizes away; the timed pass measures the
    # steady-state plan.
    for name in headline:
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Three timed reps, min per query: the host is shared, so single-shot
    # timings see multi-second noise spikes from co-tenant processes
    # (r2's pricing_summary "+16% regression" was min-of-2 measurement
    # noise; min-of-3 tightens the floor).
    # minhash_lsh_neardups memoizes its pair list (plans/extensions.py
    # _PAIRS_CACHE — legitimately shared by four graph queries in a real
    # session); for an honest per-rep timing the cache is dropped before
    # each timed run, otherwise the number measures a cache read (~0.06s)
    # instead of the banded-LSH work.
    def _reset_pairs_cache() -> None:
        from spark_streaming_invoice_anomaly_detection_spark.plans import (
            extensions as _ext,
        )

        for cache in (_ext._PAIRS_CACHE, _ext._PR_EDGES_CACHE):
            for df in cache.values():
                df.unpersist()
            cache.clear()

    pre_rep = {"minhash_lsh_neardups": _reset_pairs_cache}

    timings: dict[str, float] = {}
    for _rep in range(3):
        for name in headline:
            if name in pre_rep:
                pre_rep[name]()
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Additive context the batch timings can't show: sustained streaming
        # ingest through the reference's parse/route path. The reference's
        # only throughput envelope is its simulator's 5-10 ms pacing
        # (~100-200 rec/s, BASELINE.md); this measures the engine's actual
        # drain rate on the same wire format. Stateless portion only — the
        # stateful sessionizer is timed nowhere near a contract-critical
        # path (its timeout semantics need a running wall clock).
        "streaming_parse_lines_per_sec": _streaming_parse_rate(spark),
    }
    print(json.dumps(line))
    sys.stdout.flush()
    spark.stop()


def _streaming_parse_rate(spark, n_lines: int = 100_000) -> int:
    """Lines/sec draining a burst through parse_purchase_lines+route_events
    with an availableNow trigger (terminates deterministically)."""
    import shutil
    import tempfile

    from spark_streaming_invoice_anomaly_detection_spark.streaming.parse import (
        parse_purchase_lines,
        route_events,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(tmp, "in")
        os.makedirs(src)
        with open(os.path.join(src, "burst.txt"), "w") as f:
            for i in range(n_lines):
                inv = 100000 + (i // 4)
                qty = "notanint" if i % 97 == 0 else "6"
                f.write(
                    f"{inv},85123A,ITEM,{qty},12/1/2010 8:26,2.55,17850,"
                    "United Kingdom\n"
                )
        raw = spark.readStream.format("text").load(src)
        parsed = route_events(parse_purchase_lines(raw))
        counts: list[int] = []
        t0 = time.perf_counter()
        q = (
            parsed.writeStream.outputMode("append")
            .foreachBatch(lambda df, _e: counts.append(df.count()))
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            return -1  # did not drain; surface as sentinel, never hang
        dt = time.perf_counter() - t0
        return int(sum(counts) / dt) if dt > 0 else -1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
