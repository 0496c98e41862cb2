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
    timings: dict[str, float] = {}
    for _rep in range(3):
        for name in headline:
            if name in PRE_REP:
                PRE_REP[name]()
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
        # drain rate on the same wire format, stateless portion only.
        "streaming_parse_lines_per_sec": _streaming_parse_rate(spark),
        # The reference's core streaming operator is the keyed stateful
        # sessionizer (InvoicePipeline.scala:192-252). Same wire format,
        # full parse -> route -> applyInPandasWithState path; rate is
        # measured to the point all input rows have passed THROUGH the
        # stateful operator (cumulative numInputRows), so the fixed
        # expiry-timeout tail doesn't dilute the throughput number.
        "sessionizer_lines_per_sec": _sessionizer_rate(spark),
        # Scaling evidence: the most expensive headline queries re-timed at
        # a 10x smaller SF. ratio = t(sf)/t(sf/10); ideal < 10 with fixed
        # overheads — a super-linear ratio flags a plan that won't survive
        # the next 10x.
        "sf_scaling": _sf_scaling(spark, REGISTRY, timings, sf_dir),
    }
    print(json.dumps(line))
    sys.stdout.flush()
    spark.stop()


def _reset_pairs_cache() -> None:
    """minhash_lsh_neardups memoizes its pair list (plans/extensions.py
    _PAIRS_CACHE — legitimately shared by four graph queries in a real
    session); for an honest timing the cache is dropped before each timed
    run, otherwise the number measures a cache read (~0.06 s) instead of
    the banded-LSH work. Applies to BOTH the main loop and _sf_scaling."""
    from spark_streaming_invoice_anomaly_detection_spark.plans import (
        extensions as _ext,
    )

    for cache in (_ext._PAIRS_CACHE, _ext._PR_EDGES_CACHE):
        for df in cache.values():
            df.unpersist()
        cache.clear()


PRE_REP = {"minhash_lsh_neardups": _reset_pairs_cache}


def _sf_scaling(
    spark,
    registry,
    timings: dict[str, float],
    sf_dir: str,
    n_queries: int = 5,
) -> dict:
    """Re-time the n most expensive headline queries at the next SF down
    (sf/10) and report the runtime ratio alongside the main-SF wall time."""
    m = re.search(r"sf([0-9.]+)", sf_dir)
    if not m:
        return {}
    small_sf = float(m.group(1)) / 10
    small_dir = re.sub(
        r"sf[0-9.]+", f"sf{small_sf:g}", sf_dir
    )
    if small_dir == sf_dir or not os.path.isdir(small_dir):
        return {}
    worst = sorted(timings, key=timings.get, reverse=True)[:n_queries]
    out: dict[str, dict] = {}
    for name in worst:
        build = registry[name].spark
        if name in PRE_REP:
            PRE_REP[name]()
        build(spark, small_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up: plan/codegen for the small-SF paths
        best = None
        for _rep in range(2):
            if name in PRE_REP:
                PRE_REP[name]()
            t0 = time.perf_counter()
            build(spark, small_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ratio = timings[name] / best if best and best > 0 else -1.0
        out[name] = {
            "small_sec": round(best, 3),
            "ratio": round(ratio, 2),
        }
    return {"small_sf": small_sf, "queries": out}


def _sessionizer_rate(spark, n_lines: int = 100_000) -> int:
    """Lines/sec draining a burst through parse+route+sessionize_invoices.

    applyInPandasWithState + ProcessingTimeTimeout deadlocks under
    availableNow/processAllAvailable on this Spark build (see
    .claude/skills/verify/SKILL.md), so the query runs on a processingTime
    trigger and the clock stops when cumulative numInputRows reaches the
    burst size — input fully absorbed by the stateful operator.
    """
    import shutil
    import tempfile

    from spark_streaming_invoice_anomaly_detection_spark.streaming.parse import (
        parse_purchase_lines,
        route_events,
    )
    from spark_streaming_invoice_anomaly_detection_spark.streaming.session_state import (
        sessionize_invoices,
    )

    tmp = tempfile.mkdtemp(prefix="bench_sess_")
    try:
        src = os.path.join(tmp, "in")
        os.makedirs(src)
        with open(os.path.join(src, "burst.txt"), "w") as f:
            for i in range(n_lines):
                inv = 100000 + (i // 5)  # ~20k live sessions
                f.write(
                    f"{inv},85123A,ITEM,{i % 7 + 1},12/1/2010 8:26,2.55,"
                    "17850,United Kingdom\n"
                )
        raw = spark.readStream.format("text").load(src)
        events = route_events(parse_purchase_lines(raw))
        sessions = sessionize_invoices(
            events, trigger_seconds=1, expiry_ticks=2
        )
        q = (
            sessions.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        t0 = time.perf_counter()
        deadline = t0 + 240
        absorbed = 0
        try:
            while time.perf_counter() < deadline:
                absorbed = sum(
                    p["numInputRows"] for p in q.recentProgress
                )
                if absorbed >= n_lines:
                    break
                time.sleep(0.2)
            dt = time.perf_counter() - t0
        finally:
            q.stop()
        return int(n_lines / dt) if absorbed >= n_lines and dt > 0 else -1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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
