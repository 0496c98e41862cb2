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
    }
    print(json.dumps(line))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
