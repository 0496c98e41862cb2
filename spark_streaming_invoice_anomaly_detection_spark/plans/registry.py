"""QuerySpec registry: every operator the engine claims, with its oracle.

Each entry pairs a Spark DataFrame builder with the ANSI-SQL equivalent that
DuckDB runs on the same parquet tables (driver correctness gate,
CORRECTNESS_r{N}.json). Column names are aliased identically on both sides
because the driver hashes values after sorting columns by name.

Non-SQL-expressible operators (stateful streaming, iterative ML) register
with ``oracle=None`` -> the driver records a rows-only check.

Floating-point discipline: aggregates whose accumulation order differs
between engines (sum/avg over doubles) are rounded to 2 decimals on BOTH
sides; min/max/count and integer-valued sums are exact and left unrounded.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


# The driver samples ~50 queries per round walking the registry in
# iteration order under a wall-clock budget, so ordering is the only lever
# for getting external verification onto the long tail. Priority: queries
# changed this round (need a fresh row), then queries never sampled in any
# CORRECTNESS file (63 after r2), then the already-green ones.
_FIXED_THIS_ROUND: tuple[str, ...] = (
    "dsir_importance_weights",
    "token_entropy_census",
    "jl_projection_distortion",
    "value_drift_psi",
    "source_pmi_keywords",
    "ewma_daily_level",
    "weekly_seasonality_index",
    "source_token_kl",
    "event_transition_matrix",
    "rfm_segments",
    "data_quality_report",
    "leakage_safe_splits",
    "basket_lift_pairs",
    "bootstrap_mean_ci",
    "interarrival_quartiles",
    "rolling_median_7d",
    "winsorized_mean_by_type",
    "bloom_pruned_revenue",
    "vocab_coverage",
    "curriculum_quota_sample",
    "mad_outlier_census",
    "mmr_diversified_topk",
    "ks_drift_by_type",
    "quality_calibration_map",
    "benford_first_digit",
    "ivf_cell_occupancy",
    "important_part_value",
    "approx_quantiles_by_type",
    "nation_market_share",
    "nation_profit",
    "part_supplier_diversity",
    "arrow_text_stats",
    "spearman_qty_price",
)

def _driver_checked_names() -> frozenset[str]:
    """Names with any CORRECTNESS_r*.json row, read from the repo root at
    import time — self-updating when a new round's file lands, so the
    rotation never re-prioritizes already-green queries because a
    hardcoded list went stale. Falls back to the r1+r2 literal when the
    files aren't alongside the package (e.g. an installed wheel)."""
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    names: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                names.update(json.load(f).keys())
        except (OSError, json.JSONDecodeError, AttributeError):
            continue
    return frozenset(names) or _DRIVER_CHECKED_R1R2


# Union of query names appearing in CORRECTNESS_r01.json + CORRECTNESS_r02.json
# (fallback only; the live set is derived from the json files above).
_DRIVER_CHECKED_R1R2: frozenset[str] = frozenset({
    "approx_quantiles_by_type", "array_agg_funcs", "asof_join_last_click",
    "bisecting_invoice_anomalies", "cancellation_split",
    "centroid_distance_score", "conditional_bucketing", "count_distinct",
    "cube_orders", "date_funcs", "disjunctive_predicate_revenue",
    "doc_fingerprint", "embedding_neardup_pairs", "exact_correlation",
    "exact_dedup_groups", "exists_subquery", "explode_wordcount",
    "forecast_revenue_change", "grouping_sets", "hour_extraction",
    "invoice_featurize", "invoice_featurize_valid", "join_anti",
    "join_broadcast_dims", "join_fact_fact_revenue", "join_five_way_volume",
    "join_left_outer", "join_salted_skew", "join_semi", "json_extract",
    "kmeans_invoice_anomalies", "late_shipment_priority", "map_type_ops",
    "minhash_lsh_neardups", "multimodal_decode_stats", "ngram_jaccard_pairs",
    "order_count_distribution", "order_limit", "percentile_quartiles",
    "pivot_status", "pricing_summary", "promo_revenue_percent",
    "regex_extract_groups", "revenue_share_by_nation", "rollup_qty",
    "scalar_subquery_agg", "sessionize_events", "set_except", "set_ops",
    "set_ops_all", "simhash_signatures", "similarity_topk_bruteforce",
    "similarity_topk_lsh", "skew_diagnostics", "sliding_window_count",
    "stats_agg", "string_funcs", "text_lang_id", "text_quality_score",
    "threshold_topk", "top_returning_customers", "topk_per_group",
    "union_distinct", "validation_cascade", "video_frame_counts",
    "window_lag_delta", "window_rank_by_value", "window_running_sum",
})

_DRIVER_CHECKED: frozenset[str] = _driver_checked_names()


# Queries measured >10 s under the driver-faithful sf0.01 sim (iterative
# graph propagation, ML training sweeps). Deferred WITHIN their tier so the
# driver's wall-clock budget buys the maximum number of fresh rows before
# it spends a minute on three queries.
_COSTLY: frozenset[str] = frozenset({
    "neardup_components", "neardup_keep_best", "pagerank_neardup_graph",
    "kmeans_invoice_anomalies", "bisecting_invoice_anomalies",
    "contamination_closure", "neardup_triangle_census",
})


def _ordered_names() -> list[str]:
    fixed = [n for n in _FIXED_THIS_ROUND if n in REGISTRY]
    tail = [n for n in REGISTRY if n not in fixed]
    never = [n for n in tail if n not in _DRIVER_CHECKED]
    green = [n for n in tail if n in _DRIVER_CHECKED]
    cheap_first = lambda names: sorted(names, key=lambda n: n in _COSTLY)
    return fixed + cheap_first(never) + cheap_first(green)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers QuerySpecs (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # ml_queries registers right after the reference queries: the driver
    # walks the registry in insertion order under a wall-clock budget, and
    # round 1 showed the three ML entries starving at the tail of the list
    # (VERDICT.md "What's wrong" #2).
    from . import reference_queries  # noqa: F401
    from . import ml_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import advanced  # noqa: F401
    from . import extensions  # noqa: F401
    from . import sketch_queries  # noqa: F401
    from . import selection  # noqa: F401

    _LOADED = True
