"""Sketch operators: HLL rollup accuracy/merge-exactness, CMS structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.operators import sketches as sk
from spark_streaming_invoice_anomaly_detection_spark.plans.sketch_queries import (
    _CMS_CONF,
    _CMS_EPS,
    _CMS_SEED,
    q_hll_distinct_rollup,
)
from spark_streaming_invoice_anomaly_detection_spark.sources.catalog import load_table


def test_hll_rollup_within_error_bound(spark, sf_dir):
    """Union-of-daily-sketches estimate lands within the lg_k=12 error
    envelope (rsd ~1.6%; assert 3 sigma = 5%) of the exact distinct —
    both via the query's self-check flag and via a direct re-derivation
    of the rollup estimate against countDistinct."""
    rows = q_hll_distinct_rollup(spark, sf_dir).collect()
    assert rows and all(r["rollup_within_bound"] for r in rows)
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts")
    )
    daily = sk.distinct_sketches(ev, ["event_type", "day"], "user_id")
    est = {
        r["event_type"]: r["est"]
        for r in sk.rollup_distinct(
            daily, ["event_type"], estimate_col="est"
        ).collect()
    }
    exact = {r["event_type"]: r["exact_users"] for r in rows}
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(1, 0.05 * n), (t, est[t], n)


def test_hll_union_of_partials_equals_direct_sketch(spark, sf_dir):
    """Register-wise-max merge is associative: unioning per-day partials
    must give the SAME estimate as sketching the whole set directly —
    the property that makes stored daily sketches trustworthy."""
    ev = load_table(spark, "events", sf_dir).withColumn("day", F.to_date("ts"))
    daily = sk.distinct_sketches(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["est"]
        for r in sk.rollup_distinct(
            daily, ["event_type"], estimate_col="est"
        ).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sk.DEFAULT_LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_cms_parse_and_row_sum_invariant(spark, sf_dir):
    """Each CMS counter row receives exactly one increment per insert, so
    every row sums to total_count, and total_count is the exact row count."""
    ev = load_table(spark, "events", sf_dir)
    raw = ev.agg(
        sk.cms_agg("user_id", _CMS_EPS, _CMS_CONF, _CMS_SEED).alias("s")
    ).collect()[0]["s"]
    parsed = sk.parse_cms(bytes(raw))
    n_rows = ev.count()
    depth, width = sk.cms_depth_width(_CMS_EPS, _CMS_CONF)
    assert parsed.version == 1
    assert parsed.total_count == n_rows
    assert (parsed.depth, parsed.width) == (depth, width)
    assert len(parsed.hash_seeds) == depth
    for row in parsed.counters:
        assert sum(row) == n_rows


def test_cms_sketches_merge_deterministically(spark, sf_dir):
    """Same data, same seed -> byte-identical sketch regardless of
    partitioning (merge is cell-wise addition, order-free)."""
    ev = load_table(spark, "events", sf_dir)
    one = ev.coalesce(1).agg(
        sk.cms_agg("user_id", _CMS_EPS, _CMS_CONF, _CMS_SEED).alias("s")
    ).collect()[0]["s"]
    many = ev.repartition(16).agg(
        sk.cms_agg("user_id", _CMS_EPS, _CMS_CONF, _CMS_SEED).alias("s")
    ).collect()[0]["s"]
    assert bytes(one) == bytes(many)


def test_hll_sketches_survive_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The storable-partial claim end-to-end: persist per-day sketches to
    parquet, read them back, union — same estimates as never persisting.
    (This is the rescan-free date-range rollup a deployment relies on.)"""
    ev = load_table(spark, "events", sf_dir).withColumn("day", F.to_date("ts"))
    daily = sk.distinct_sketches(ev, ["event_type", "day"], "user_id")
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)

    stored = spark.read.parquet(path)
    from_disk = {
        r["event_type"]: r["est"]
        for r in sk.rollup_distinct(stored, ["event_type"], estimate_col="est").collect()
    }
    live = {
        r["event_type"]: r["est"]
        for r in sk.rollup_distinct(daily, ["event_type"], estimate_col="est").collect()
    }
    assert from_disk == live

    # date-range rollup without rescanning events: union only 3 days' files
    some_days = [r["day"] for r in stored.select("day").distinct().limit(3).collect()]
    subset = stored.filter(F.col("day").isin(some_days))
    est = {
        r["event_type"]: r["est"]
        for r in sk.rollup_distinct(subset, ["event_type"], estimate_col="est").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("day").isin(some_days))
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(1, 0.05 * n), (t, est[t], n)


@pytest.mark.parametrize(
    "eps,conf",
    [(0.1, 0.9), (0.01, 0.99), (0.001, 0.999)],
)
def test_cms_envelope_across_parameter_grid(spark, sf_dir, eps, conf):
    """Wire-format invariants hold across the (eps, confidence) grid:
    parsed depth/width match the public sizing formula, the byte length
    is exactly the header+seeds+counters layout, and totals stay exact."""
    ev = load_table(spark, "events", sf_dir).limit(500)
    raw = ev.agg(sk.cms_agg("user_id", eps, conf, 7).alias("s")).collect()[0]["s"]
    parsed = sk.parse_cms(bytes(raw))
    depth, width = sk.cms_depth_width(eps, conf)
    assert (parsed.depth, parsed.width) == (depth, width)
    assert len(bytes(raw)) == 20 + 8 * depth + 8 * depth * width
    n = ev.count()
    assert parsed.total_count == n
    assert all(sum(row) == n for row in parsed.counters)
