"""Advanced relational coverage: arrays, explode, pivot, exact percentiles,
as-of join, and batch gap-sessionization.

These extend SURVEY.md §2's inventory with operator families the reference
never needed but a complete engine must have (SURVEY.md §2.3 "not present in
the reference ... additions"). Each is expressed as a declarative DataFrame
plan (Catalyst picks the physical strategy) with a DuckDB oracle twin.

Scale notes per query live in the docstrings — the common themes: arrays are
built with map-side combine (collect_list inside a hash agg), the as-of join
is a single shuffle-by-user_id + one window pass (no range-explosion), and
sessionization is two window passes over the same partitioning (one
Exchange, reused by AQE).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as X
from ..operators.text import h60_sql
from ..sources.catalog import load_table
from .registry import QuerySpec, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Arrays: collect_list / array_sort / element_at / array_join
# ---------------------------------------------------------------------------


def q_array_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted quantity array, serialized for exact comparison.

    collect_list happens inside the hash aggregate (partial per partition,
    merged in the final agg) — one shuffle on l_orderkey. The sort makes the
    array deterministic; array_join fixes the cross-engine representation.
    """
    li = _t(spark, sf_dir, "lineitem")
    qtys = F.array_sort(F.collect_list(F.col("l_quantity").cast("int")))
    return li.groupBy("l_orderkey").agg(
        F.array_join(qtys, ",").alias("qtys"),
        F.size(qtys).alias("n_lines"),
        F.element_at(qtys, 1).alias("min_qty"),
        F.element_at(qtys, -1).alias("max_qty"),
    )


register(
    QuerySpec(
        name="array_agg_funcs",
        description="collect_list -> array_sort/element_at/array_join per order",
        spark=q_array_agg_funcs,
        oracle="""
            SELECT l_orderkey,
                   array_to_string(list_sort(list(CAST(l_quantity AS INT))), ',')
                       AS qtys,
                   CAST(count(*) AS INT) AS n_lines,
                   list_sort(list(CAST(l_quantity AS INT)))[1] AS min_qty,
                   list_sort(list(CAST(l_quantity AS INT)))[-1] AS max_qty
            FROM lineitem
            GROUP BY l_orderkey
        """,
    )
)


# ---------------------------------------------------------------------------
# Explode / unnest: word count over documents
# ---------------------------------------------------------------------------


def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 words: explode(split) -> hash agg -> TakeOrdered.

    The generate (explode) runs inside whole-stage codegen; the count is a
    partial+final hash agg, and the top-100 is a per-partition TakeOrdered
    merge on the driver — no global sort at any scale. Deterministic
    tie-break (count desc, word asc) so the limit boundary is stable.
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(X.ascii_lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(100)
    )


register(
    QuerySpec(
        name="explode_wordcount",
        description="explode(split(text)) word count, deterministic top-100",
        spark=q_explode_wordcount,
        oracle=r"""
            SELECT word, count(*) AS n
            FROM (
                SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+')) AS word
                FROM documents
            )
            WHERE word <> ''
            GROUP BY word
            ORDER BY n DESC, word ASC
            LIMIT 100
        """,
    )
)


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns (explicit value list -> no extra
    distinct-values job; min() is order-insensitive so exact cross-engine).
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.min("o_totalprice"))
    )


register(
    QuerySpec(
        name="pivot_status",
        description="groupBy().pivot() with pinned values, min aggregate",
        spark=q_pivot_status,
        oracle="""
            SELECT o_orderpriority,
                   min(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS "F",
                   min(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS "O",
                   min(o_totalprice) FILTER (WHERE o_orderstatus = 'P') AS "P"
            FROM orders
            GROUP BY o_orderpriority
        """,
    )
)


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated), per group
# ---------------------------------------------------------------------------


def q_percentile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles of l_quantity per return flag.

    Spark's `percentile` (exact, not approx) and DuckDB's `quantile_cont`
    share the (n-1)*p rank definition; l_quantity is integral so the
    interpolation arithmetic is exact in binary floating point.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q1"),
        F.expr("percentile(l_quantity, 0.5)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q3"),
    )


register(
    QuerySpec(
        name="percentile_quartiles",
        description="exact interpolated percentile() per group",
        spark=q_percentile_quartiles,
        oracle="""
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.25) AS q1,
                   quantile_cont(l_quantity, 0.5) AS median,
                   quantile_cont(l_quantity, 0.75) AS q3
            FROM lineitem
            GROUP BY l_returnflag
        """,
    )
)


# ---------------------------------------------------------------------------
# As-of join (time-series): latest click at-or-before each purchase
# ---------------------------------------------------------------------------


def q_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as union + one window pass (Spark has no native
    ASOF; DuckDB does — that's the oracle).

    Instead of a range join (which explodes to |purchases| x |clicks| per
    user before filtering), tag both streams, sort each user's events once,
    and carry the last non-null click timestamp forward:
    one shuffle on user_id, one ordered window scan — O(n log n) per
    partition, skew bounded by the busiest user. At equal timestamps the
    (ts, event_type) sort puts 'click' < 'purchase', matching ASOF's
    inclusive `>=` bound.
    """
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    both = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", F.col("last_click_ts").alias("click_ts"))
    )


register(
    QuerySpec(
        name="asof_join_last_click",
        description="as-of join via union+window vs DuckDB native ASOF JOIN",
        spark=q_asof_join_last_click,
        oracle="""
            SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
    )
)


# ---------------------------------------------------------------------------
# Batch gap-sessionization (relational twin of streaming/session_state.py)
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: lag -> new-session flag -> running sum -> agg.

    Both window passes and the final aggregate share the user_id
    partitioning, so the whole query is ONE Exchange; the gap arithmetic is
    exact integer microseconds (unix_micros / epoch_us on the oracle side).
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_us = F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        lag_us.isNull() | (F.unix_micros("ts") - lag_us > _GAP_US), 1
    ).otherwise(0)
    return (
        e.withColumn("session_id", F.sum(new_sess).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


register(
    QuerySpec(
        name="sessionize_events",
        description="gap-based sessionization: 2 windows + agg, one shuffle",
        spark=q_sessionize_events,
        oracle=f"""
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > {_GAP_US}
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_id
                FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM numbered
            GROUP BY user_id, session_id
        """,
    )
)


# ---------------------------------------------------------------------------
# Window frames & ranking breadth: RANGE frame, ntile
# ---------------------------------------------------------------------------


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based frame, not row-based): per user,
    count of events whose event_id lies within 1000 of the current one.

    One shuffle on user_id; the frame is evaluated with a sliding pointer
    over the sorted partition — no self-join, which is how a value-range
    predicate must be expressed to survive at scale (the naive equivalent
    is an O(n^2) theta-join per user).
    """
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rangeBetween(-1000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
    )


register(
    QuerySpec(
        name="window_range_frame",
        description="RANGE BETWEEN 1000 PRECEDING frame over events "
        "(value-based frame, integer count: cross-engine exact)",
        spark=q_window_range_frame,
        oracle="""
            SELECT event_id, user_id,
                   count(*) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
                   ) AS n_in_range
            FROM events
        """,
    )
)


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) engagement quartiles per user by event recency order.

    Deterministic total order (ts, event_id) — ntile over a partial order
    is nondeterministic across engines, so the unique tail key is load-
    bearing, not cosmetic.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", F.ntile(4).over(w).alias("quartile")
    )


register(
    QuerySpec(
        name="window_ntile",
        description="ntile(4) per user over (ts, event_id) total order",
        spark=q_window_ntile,
        oracle="""
            SELECT event_id, user_id,
                   CAST(ntile(4) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS INT) AS quartile
            FROM events
        """,
    )
)


# ---------------------------------------------------------------------------
# Full outer join + unpivot
# ---------------------------------------------------------------------------


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer customer<->orders: customers without orders keep a null
    order count; orphan orders (none in conformant data) would surface with
    a null customer side. Orders pre-aggregates BEFORE the join, so the
    outer join is key-to-key (one row per side per key), not key-to-N.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


register(
    QuerySpec(
        name="join_full_outer",
        description="full outer join customer vs per-customer order counts",
        spark=q_join_full_outer,
        oracle="""
            WITH o AS (
                SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY o_custkey
            )
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
                   c.c_mktsegment AS mktsegment,
                   COALESCE(o.n_orders, 0) AS n_orders
            FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        """,
    )
)


def q_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot of part's two numeric measures via ``stack`` —
    a generator expression (no shuffle, no join): each input row fans out
    to exactly 2 output rows inside the same task.
    """
    p = _t(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), "
        "'retailprice', p_retailprice) AS (measure, val)",
    )


register(
    QuerySpec(
        name="unpivot_part_measures",
        description="unpivot (stack) part measures wide-to-long",
        spark=q_unpivot_part_measures,
        oracle="""
            SELECT p_partkey, 'size' AS measure,
                   CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val
            FROM part
        """,
    )
)


# ---------------------------------------------------------------------------
# Time-range join (bucketed — the scale-safe form of a theta join)
# ---------------------------------------------------------------------------

_COOC_GAP_US = 10_000_000  # 10 s


def q_range_join_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user co-occurrence: pairs of events from different users within
    10 s of each other.

    A naive `|Δts| <= 10s` predicate is a BroadcastNestedLoopJoin — O(n²).
    `bucketed_time_range_join` quantizes time into 10 s buckets and
    equi-joins on the bucket id (one side exploded to its 3 candidate
    buckets), so Catalyst plans an ordinary shuffled equi-join; the exact
    range + user inequality run as a post-join filter over ~density-sized
    candidate sets. Survives 100× because candidates scale with temporal
    density, not corpus size squared.
    """
    from ..operators.rangejoin import bucketed_time_range_join

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    a = e.select(
        F.col("event_id").alias("event_id_a"),
        F.col("user_id").alias("user_id_a"),
        F.col("ts_us").alias("ts_us_a"),
    )
    b = e.select(
        F.col("event_id").alias("event_id_b"),
        F.col("user_id").alias("user_id_b"),
        F.col("ts_us").alias("ts_us_b"),
    )
    pairs = bucketed_time_range_join(
        a,
        b,
        "ts_us_a",
        "ts_us_b",
        _COOC_GAP_US,
        extra_cond=F.col("user_id_a") < F.col("user_id_b"),
    )
    return pairs.select(
        "event_id_a",
        "event_id_b",
        "user_id_a",
        "user_id_b",
        (F.col("ts_us_b") - F.col("ts_us_a")).alias("gap_us"),
    )


register(
    QuerySpec(
        name="range_join_cooccurrence",
        description="time-range join via bucket equi-join: cross-user event "
        "pairs within 10 s (exact int64 microsecond arithmetic)",
        spark=q_range_join_cooccurrence,
        oracle=f"""
            SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
                   a.user_id AS user_id_a, b.user_id AS user_id_b,
                   epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
            FROM events a JOIN events b
              ON a.user_id < b.user_id
             AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {_COOC_GAP_US}
        """,
    )
)


# ---------------------------------------------------------------------------
# Approximate distinct (HLL sketch). Sketch ESTIMATES are engine-specific
# (no DuckDB twin), so the externally-checked output carries the exact
# distinct count (oracle-exact) plus a within-bound flag whose twin is
# literal TRUE: if Spark's HLL ever drifts past the envelope the flag
# flips and the value hash fails. The raw estimate stays pytest-pinned.
# ---------------------------------------------------------------------------

#: HLL++ rsd requested, and the error envelope the check licenses (3x rsd
#: — the estimate is deterministic per dataset; measured error on the
#: sf0.001/0.01/0.1 events tables is < 2 rsd, so 3x holds with margin).
_HLL_RSD = 0.02
_HLL_BOUND = 3 * _HLL_RSD


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type (rsd 2%),
    verified in-query against the exact count.

    The sketch is the 100 TB path for COUNT(DISTINCT): partial sketches
    merge associatively map-side, so the shuffle carries one ~kB sketch per
    (partition, group) instead of every distinct key — contrast with
    `count_distinct`'s exact two-phase expansion. The exact twin column
    here is the VERIFICATION harness (it pays the exact expansion once so
    the driver can hash it); the production path reads the sketch alone.
    """
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=_HLL_RSD).cast("double")
                - F.count_distinct("user_id").cast("double")
            )
            <= F.lit(_HLL_BOUND) * F.count_distinct("user_id").cast("double")
        ).alias("hll_within_bound"),
    )


register(
    QuerySpec(
        name="approx_distinct_users",
        description="HLL++ approx distinct users per event_type, checked "
        "in-query: exact twin column + within-3rsd flag (estimate itself "
        "is engine-specific; its value is pinned in pytest)",
        spark=q_approx_distinct_users,
        oracle="""
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   TRUE AS hll_within_bound
            FROM events GROUP BY event_type
        """,
    )
)


# ---------------------------------------------------------------------------
# Window value functions: first/last/nth value, percent_rank, cume_dist
# ---------------------------------------------------------------------------


def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic value-function family over a deterministic total order
    (o_orderdate, o_orderkey) per customer: first/last order keys with an
    explicit full-partition frame (last_value under the default frame is a
    classic wrong-answer trap — it sees only rows up to CURRENT ROW),
    plus percent_rank / cume_dist as exact integer-ratio doubles.
    """
    o = _t(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    full_w = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(full_w).alias("first_key"),
        F.last("o_orderkey").over(full_w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(full_w).alias("second_key"),
        F.percent_rank().over(order_w).alias("pct_rank"),
        F.cume_dist().over(order_w).alias("cume"),
    )


register(
    QuerySpec(
        name="window_value_funcs",
        description="first/last/nth_value over explicit full frame + "
        "percent_rank/cume_dist per customer order history",
        spark=q_window_value_funcs,
        oracle="""
            SELECT o_orderkey, o_custkey,
                   first_value(o_orderkey) OVER w_full AS first_key,
                   last_value(o_orderkey) OVER w_full AS last_key,
                   nth_value(o_orderkey, 2) OVER w_full AS second_key,
                   percent_rank() OVER w_ord AS pct_rank,
                   cume_dist() OVER w_ord AS cume
            FROM orders
            WINDOW
              w_ord AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
              w_full AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        """,
    )
)


# ---------------------------------------------------------------------------
# Time-series gap fill: dense per-user hourly grid + forward fill. The
# resample step every monitoring/feature pipeline needs; grid generation is
# map-side sequence+explode (no shuffle beyond the final window).
# ---------------------------------------------------------------------------


def q_gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid between that user's first and last event, with
    missing hours forward-filled from the last observed hourly max.

    Shapes: one agg for user spans, sequence+explode for the grid (output
    rows ∝ span-hours, generated distributed, never on the driver), a
    grid⋈hourly left join co-partitioned on (user_id, hour), and one
    partitioned window for the fill. max() is the filled aggregate —
    order-independent, so the oracle matches exactly with no float
    discipline needed.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    hourly = ev.groupBy("user_id", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("value_max"),
    )
    spans = ev.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    return joined.select(
        "user_id",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last("value_max", ignorenulls=True).over(w).alias("value_filled"),
        F.col("value_max").isNull().alias("is_gap"),
    )


register(
    QuerySpec(
        name="gapfill_forward_fill",
        description="dense per-user hourly grid with forward-filled hourly "
        "max (resample + LOCF)",
        spark=q_gapfill_forward_fill,
        oracle="""
            WITH ev AS (
                SELECT user_id, date_trunc('hour', ts) AS hour, value
                FROM events
            ),
            hourly AS (
                SELECT user_id, hour, count(*) AS n_events,
                       max(value) AS value_max
                FROM ev GROUP BY user_id, hour
            ),
            spans AS (
                SELECT user_id, min(hour) AS h0, max(hour) AS h1
                FROM ev GROUP BY user_id
            ),
            grid AS (
                SELECT user_id,
                       unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                         AS hour
                FROM spans
            )
            SELECT g.user_id, g.hour,
                   coalesce(h.n_events, 0) AS n_events,
                   last_value(h.value_max IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value_filled,
                   h.value_max IS NULL AS is_gap
            FROM grid g
            LEFT JOIN hourly h
              ON g.user_id = h.user_id AND g.hour = h.hour
        """,
    )
)


# ---------------------------------------------------------------------------
# Equal-width histogram: data-driven [min,max] split into 20 bins. The
# profiling primitive behind skew detection and quantile sanity checks.
# ---------------------------------------------------------------------------

_HIST_BINS = 20


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equal-width histogram of events.value: one scalar min/max
    pass (broadcast single row), one map-side bin computation, one 20-group
    aggregate. Bin arithmetic is plain IEEE sub/div/floor on identical
    inputs — bit-identical across engines, no rounding discipline needed.
    """
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    b = F.lit(_HIST_BINS)
    width = (F.col("vmax") - F.col("vmin")) / b.cast("double")
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(_HIST_BINS - 1),
            F.floor((F.col("value") - F.col("vmin")) / width).cast("int"),
        ).alias("bin"),
        "value",
        "vmin",
        width.alias("w"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        (F.first("vmin") + F.col("bin").cast("double") * F.first("w")).alias(
            "bin_lo"
        ),
    )


register(
    QuerySpec(
        name="value_histogram",
        description="20-bin equal-width histogram of events.value with "
        "data-driven bounds",
        spark=q_value_histogram,
        oracle=f"""
            WITH bounds AS (
                SELECT min(value) AS vmin, max(value) AS vmax FROM events
            ),
            binned AS (
                SELECT least({_HIST_BINS - 1},
                             CAST(floor((value - vmin)
                                  / ((vmax - vmin) / {float(_HIST_BINS)!r}))
                                  AS INT)) AS bin,
                       vmin,
                       (vmax - vmin) / {float(_HIST_BINS)!r} AS w
                FROM events, bounds
            )
            SELECT bin, count(*) AS n,
                   min(vmin) + CAST(bin AS DOUBLE) * min(w) AS bin_lo
            FROM binned GROUP BY bin
        """,
    )
)


# ---------------------------------------------------------------------------
# Cohort / funnel analytics over the events stream
# ---------------------------------------------------------------------------


def q_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user curve: per day, how many users appeared for the FIRST
    time, plus the running total. First-seen is a per-user min (one
    shuffle on user_id, map-side combined); the running total's window
    runs over day-grain rows only (~tens), never raw events.
    """
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("DAY", F.min("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "first_day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


register(
    QuerySpec(
        name="cumulative_new_users",
        description="cohort entry curve: first-seen day per user, daily "
        "new-user counts + running total",
        spark=q_cumulative_new_users,
        oracle="""
            WITH first_seen AS (
                SELECT user_id, date_trunc('day', min(ts)) AS first_day
                FROM events GROUP BY user_id
            ),
            per_day AS (
                SELECT first_day, count(*) AS n_new_users
                FROM first_seen GROUP BY first_day
            )
            SELECT first_day, n_new_users,
                   CAST(sum(n_new_users) OVER (ORDER BY first_day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_users
            FROM per_day
        """,
    )
)


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase per user: a stage counts
    only if its first occurrence follows the previous stage's. One
    conditional-min aggregation per user, then a single funnel-census row
    — no joins, no window over raw events.
    """
    ev = _t(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_clicked_after_view"),
        F.sum(purchased.cast("long")).alias("n_purchased_after_click"),
    )


register(
    QuerySpec(
        name="funnel_conversion",
        description="ordered view->click->purchase funnel census via "
        "conditional first-occurrence aggregates",
        spark=q_funnel_conversion,
        oracle="""
            WITH per_user AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END)
                         AS t_view,
                       min(CASE WHEN event_type = 'click' THEN ts END)
                         AS t_click,
                       min(CASE WHEN event_type = 'purchase' THEN ts END)
                         AS t_purchase
                FROM events GROUP BY user_id
            )
            SELECT count(*) AS n_users,
                   CAST(sum(CASE WHEN t_view IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
                   CAST(sum(CASE WHEN t_view IS NOT NULL
                                  AND t_click > t_view
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_clicked_after_view,
                   CAST(sum(CASE WHEN t_view IS NOT NULL
                                  AND t_click > t_view
                                  AND t_purchase > t_click
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_purchased_after_click
            FROM per_user
        """,
    )
)


def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-seen week; for each
    (cohort week, week offset), how many distinct cohort members were
    active. First-seen is one agg; the user->cohort map joins back
    broadcast (users are orders of magnitude fewer than events); the
    distinct count shuffles once on the (cohort, offset, user) triple.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("WEEK", F.col("ts")).alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = ev.join(F.broadcast(cohort), "user_id")
    offset = F.floor(
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
        / F.lit(604800.0)
    ).cast("int")
    return (
        joined.select("user_id", "cohort_week", offset.alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


register(
    QuerySpec(
        name="weekly_retention",
        description="retention triangle: distinct active users per "
        "(first-seen cohort week, week offset)",
        spark=q_weekly_retention,
        oracle="""
            WITH ev AS (
                SELECT user_id, date_trunc('week', ts) AS week FROM events
            ),
            cohort AS (
                SELECT user_id, min(week) AS cohort_week
                FROM ev GROUP BY user_id
            ),
            act AS (
                SELECT DISTINCT e.user_id, c.cohort_week,
                       CAST(floor(date_diff('second', c.cohort_week, e.week)
                                  / 604800.0) AS INT) AS week_offset
                FROM ev e JOIN cohort c ON e.user_id = c.user_id
            )
            SELECT cohort_week, week_offset, count(*) AS n_active
            FROM act GROUP BY cohort_week, week_offset
        """,
    )
)


def q_cdc_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: a change log (insert/update/delete per key, ordered by
    sequence) collapsed to the final snapshot — latest op per key wins,
    deletes drop the key. One window (partition by key, order by seq
    desc) + rank-1 filter: the merge pattern every lakehouse ingest runs.

    The change log is synthesized deterministically from events: seq =
    event_id, key = user_id, op from event_type (error=>D, signup=>I,
    else U), payload = value.
    """
    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        F.col("value").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return latest.filter(F.col("op") != "D").select(
        "key", "seq", "op", "payload"
    )


register(
    QuerySpec(
        name="cdc_apply_snapshot",
        description="CDC merge: latest-op-per-key over a change log, "
        "deletes drop the key (lakehouse ingest collapse)",
        spark=q_cdc_apply_snapshot,
        oracle="""
            WITH log AS (
                SELECT user_id AS key, event_id AS seq,
                       CASE WHEN event_type = 'error' THEN 'D'
                            WHEN event_type = 'signup' THEN 'I'
                            ELSE 'U' END AS op,
                       value AS payload
                FROM events
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY key
                                             ORDER BY seq DESC) AS rn
                FROM log
            )
            SELECT key, seq, op, payload
            FROM ranked WHERE rn = 1 AND op <> 'D'
        """,
    )
)


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via VariantType (Spark 4): parse the props
    JSON once into a variant, extract typed fields, aggregate. Variant
    keeps the parsed binary form across expressions — repeated
    ``get_json_object`` calls re-parse the string every time, which at
    100 TB is the difference between one scan and k scans of the JSON.
    """
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


register(
    QuerySpec(
        name="variant_extract",
        description="VariantType semi-structured extraction: parse_json "
        "once, typed variant_get, aggregate per event type",
        spark=q_variant_extract,
        oracle="""
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS INT))
                        AS BIGINT) AS sum_k,
                   min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
                   max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type
        """,
    )
)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from the same synthesized change log as
    cdc_apply_snapshot: each change opens a validity interval closed by
    the key's next change (lead window); the open row per key is flagged
    current. The dimension-history build every warehouse runs beside the
    type-1 snapshot collapse.
    """
    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        F.col("ts").alias("changed_at"),
        F.col("value").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy("seq")
    return log.select(
        "key",
        "seq",
        "payload",
        F.col("changed_at").alias("valid_from"),
        F.lead("changed_at").over(w).alias("valid_to"),
        F.lead("seq").over(w).isNull().alias("is_current"),
    )


register(
    QuerySpec(
        name="scd2_history",
        description="SCD2 dimension history: per-key validity intervals "
        "from the change log, open row flagged current",
        spark=q_scd2_history,
        oracle="""
            SELECT user_id AS key,
                   event_id AS seq,
                   value AS payload,
                   ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   lead(event_id) OVER w IS NULL AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """,
    )
)


# ---------------------------------------------------------------------------
# Spearman rank correlation without a global row window
# ---------------------------------------------------------------------------


def _min_rank_map(df: DataFrame, col: str) -> DataFrame:
    """value -> min-rank (count of strictly smaller rows + 1).

    Built from per-VALUE counts: the window runs over distinct values
    (bounded — a 2-decimal price grid, not the row count), so no global
    per-row windowing ever happens; rows get their rank by joining this
    map back.
    """
    counts = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        "v",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.lit(1)).alias("rank"),
    )


def rank_moments(ranked: DataFrame) -> DataFrame:
    """1-row exact moment sums over integer rank columns ``rx``/``ry``.

    decimal(19,0) operands -> decimal(38,0) products and sums: exact
    integer arithmetic to ~1e12 rows (sum(rank^2) <= n^3 <= 1e36), still
    a mergeable hash aggregate. int64 would wrap (ANSI: fail) at ~2e6 rows.
    """
    rx = F.col("rx").cast("decimal(19,0)")
    ry = F.col("ry").cast("decimal(19,0)")
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx).alias("sx"),
        F.sum(ry).alias("sy"),
        F.sum(rx * ry).alias("sxy"),
        F.sum(rx * rx).alias("sxx"),
        F.sum(ry * ry).alias("syy"),
    )


def q_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between l_quantity and l_extendedprice.

    rho = Pearson over min-ranks (ties -> min rank on BOTH sides, keeping
    every rank an integer). The five moment sums accumulate in exact
    decimal(38,0) — mergeable in any order, headroom to ~1e12 rows
    (sum(rank^2) <= n^3 <= 1e36 < 1e38), where int64 capped out at ~2e6
    rows — and the final formula is one fixed-order double expression
    (identical IEEE ops in DuckDB, which accumulates the same moments in
    HUGEINT), so the statistic is bit-reproducible. Scale shape: two
    distinct-value rank maps (window over the value grid, not rows), two
    joins back (quantity map is broadcast — 50 values; price map shuffles
    on the price key), one global 1-row aggregate.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    rq = _min_rank_map(li, "l_quantity").withColumnRenamed("rank", "rx")
    rp = _min_rank_map(li, "l_extendedprice").withColumnRenamed("rank", "ry")
    ranked = (
        li.join(F.broadcast(rq), li.l_quantity == rq.v)
        .drop("v")
        .join(rp, li.l_extendedprice == rp.v)
        .drop("v")
    )
    m = rank_moments(ranked)
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    rho = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return m.select("n", rho.alias("spearman_rho"))


register(
    QuerySpec(
        name="spearman_qty_price",
        description="Spearman rank correlation via distinct-value min-rank "
        "maps (no global row window), exact int64 moments",
        spark=q_spearman_qty_price,
        oracle="""
            WITH ranked AS (
                SELECT CAST(rank() OVER (ORDER BY l_quantity) AS BIGINT)
                         AS rx,
                       CAST(rank() OVER (ORDER BY l_extendedprice) AS BIGINT)
                         AS ry
                FROM lineitem
            ), m AS (
                SELECT count(*) AS n,
                       sum(CAST(rx AS HUGEINT)) AS sx,
                       sum(CAST(ry AS HUGEINT)) AS sy,
                       sum(CAST(rx AS HUGEINT) * ry) AS sxy,
                       sum(CAST(rx AS HUGEINT) * rx) AS sxx,
                       sum(CAST(ry AS HUGEINT) * ry) AS syy
                FROM ranked
            )
            SELECT n,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     AS spearman_rho
            FROM m
        """,
    )
)


# ---------------------------------------------------------------------------
# Native session_window: Spark's built-in session operator (batch form)
# ---------------------------------------------------------------------------


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 30-minute-gap sessions as ``sessionize_events``, but via
    Spark's NATIVE ``session_window`` aggregation — the operator that runs
    identically over a stream (where the gaps-and-islands window form is
    impossible: no unbounded lag on unbounded input).

    Boundary semantics pinned on both sides: session_window merges an
    event into the open session iff its timestamp is STRICTLY inside
    (last_ts + gap); the oracle's new-session flag is therefore
    ``diff >= gap``, not ``>``. Window start = first event, end = last
    event + gap. The struct column is unpacked to scalar start/end — the
    driver's canonicalizer cannot sort struct values.
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


register(
    QuerySpec(
        name="session_window_native",
        description="native session_window aggregation (stream-capable "
        "sessionizer), strict-gap merge semantics, struct unpacked",
        spark=q_session_window_native,
        oracle=f"""
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    >= {_GAP_US}
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_id
                FROM flagged
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events
            FROM numbered
            GROUP BY user_id, session_id
        """,
    )
)


# ---------------------------------------------------------------------------
# Time-based RANGE frame: 7-day trailing revenue
# ---------------------------------------------------------------------------


def q_trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with its 7-day trailing sum — the time-based RANGE
    frame (value range, not row count: days with no sales still age out
    of the window correctly, which a ROWS frame gets wrong).

    Two-level shape: the heavy lineitem scan collapses to one row per day
    in a partial+final hash agg FIRST; the window then runs over ~2k daily
    rows — never over raw lineitem. The frame orders on the integer day
    number (days since epoch) with rangeBetween(-6, 0), identical
    arithmetic on both engines; revenue aggregates on the exact scaled
    int64 grid throughout and divides once at the end.
    """
    from ..functions.exactmath import scaled_long

    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(
            F.sum(
                scaled_long(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                )
            ).alias("rev_s")
        )
        .withColumn("day_no", F.datediff(F.col("d"), F.lit("1970-01-01")))
    )
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "d",
        (F.col("rev_s") / F.lit(10_000.0)).alias("day_revenue"),
        (F.sum("rev_s").over(w) / F.lit(10_000.0)).alias("trailing7_revenue"),
    )


register(
    QuerySpec(
        name="trailing_week_revenue",
        description="time-based RANGE frame: 7-day trailing revenue over "
        "pre-aggregated daily rows (exact int64 grid)",
        spark=q_trailing_week_revenue,
        oracle="""
            WITH daily AS (
                SELECT CAST(l_shipdate AS DATE) AS d,
                       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                           * 10000.0 + 0.5) AS BIGINT))
                            AS BIGINT) AS rev_s,
                       CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                            AS BIGINT) AS day_no
                FROM lineitem
                GROUP BY 1, 3
            )
            SELECT d,
                   rev_s / 10000.0 AS day_revenue,
                   CAST(sum(rev_s) OVER (
                       ORDER BY day_no
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) / 10000.0 AS trailing7_revenue
            FROM daily
        """,
    )
)


# ---------------------------------------------------------------------------
# Rolling 7-day DISTINCT users: windowed count-distinct via day-grid explode
# ---------------------------------------------------------------------------


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the trailing 7 days, per day — the
    windowed COUNT DISTINCT that window functions cannot express (Spark
    forbids DISTINCT aggregates over frames; a RANGE-frame count would
    double-count multi-day users).

    Shape: collapse events to (day, user) pairs FIRST (one hash distinct
    — the only pass over raw events), then explode each pair onto the <=7
    window days it is visible in, and count distinct per window day. The
    7x fan-out happens on the already-deduped day-user pairs, not raw
    events; at larger windows the HLL sketch path (approx_distinct_users)
    is the scale alternative and this exact form is its oracle twin.
    """
    ev = _t(spark, sf_dir, "events")
    day_users = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
            "user_id",
        )
        .distinct()
    )
    bounds = day_users.agg(F.max("day_no").alias("hi"))
    return (
        day_users.select(
            F.explode(
                F.sequence(F.col("day_no"), F.col("day_no") + F.lit(6))
            ).alias("w_day"),
            "user_id",
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("w_day") <= F.col("hi"))
        .groupBy("w_day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_add(F.lit("1970-01-01"), F.col("w_day")).alias("d"),
            "active_users_7d",
        )
    )


register(
    QuerySpec(
        name="rolling_distinct_users",
        description="trailing-7-day distinct active users per day "
        "(windowed COUNT DISTINCT via deduped day-grid explode)",
        spark=q_rolling_distinct_users,
        oracle="""
            WITH day_users AS (
                SELECT DISTINCT
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                         AS day_no,
                       user_id
                FROM events
            ), bounds AS (
                SELECT max(day_no) AS hi FROM day_users
            ), grid AS (
                SELECT unnest(generate_series(day_no, day_no + 6)) AS w_day,
                       user_id
                FROM day_users
            )
            SELECT CAST(DATE '1970-01-01' + INTERVAL (w_day) DAY AS DATE)
                     AS d,
                   count(DISTINCT user_id) AS active_users_7d
            FROM grid, bounds
            WHERE w_day <= hi
            GROUP BY w_day
        """,
    )
)


# ---------------------------------------------------------------------------
# Distribution drift: exact total-variation distance, first vs second half
# ---------------------------------------------------------------------------

_TV_BINS = 20


def _halved_bins(ev: DataFrame, bins: int) -> DataFrame:
    """Shared TV/PSI front end: (event_type, half, bin) with the time
    midpoint and fixed-width value bins, bounds from one broadcast 1-row
    agg. Degenerate guard: when every value is identical (v_hi == v_lo,
    or all NULL) the width division would be 0/0 — NaN whose int cast
    aborts under ANSI and disagrees with DuckDB's NULL — so all rows land
    in bin 0 on both engines instead. NULL values (TV keeps them, PSI
    filters first) fall to the TOP bin via least(bins-1, NULL-skipping
    least) — quirky but probe-verified identical in Spark and DuckDB.
    """
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t_lo"),
        F.max(F.unix_micros("ts")).alias("t_hi"),
        F.min("value").alias("v_lo"),
        F.max("value").alias("v_hi"),
    )
    bin_col = F.when(
        F.col("v_hi") > F.col("v_lo"),
        F.least(
            F.lit(bins - 1),
            F.floor(
                (F.col("value") - F.col("v_lo"))
                / (F.col("v_hi") - F.col("v_lo"))
                * F.lit(float(bins))
            ).cast("int"),
        ),
    ).otherwise(F.lit(0))
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        # integer midpoint: identical floor division on both engines
        (F.unix_micros("ts")
         >= (F.col("t_lo") + F.col("t_hi")) / F.lit(2)).cast("int")
        .alias("half"),
        bin_col.alias("bin"),
    )


def _halved_bins_sql(bins: int, where: str = "") -> str:
    """DuckDB twin of :func:`_halved_bins`: bounds + binned CTE bodies
    (caller embeds them in its WITH list)."""
    return f"""bounds AS (
                SELECT min(epoch_us(ts)) AS t_lo, max(epoch_us(ts)) AS t_hi,
                       min(value) AS v_lo, max(value) AS v_hi
                FROM events {where}
            ), binned AS (
                SELECT event_type,
                       CAST(epoch_us(ts) >= (t_lo + t_hi) / 2 AS INT)
                         AS half,
                       CASE WHEN v_hi > v_lo THEN
                            least({bins - 1},
                                  CAST(floor((value - v_lo) / (v_hi - v_lo)
                                             * {float(bins)!r}) AS INT))
                       ELSE 0 END AS bin
                FROM events, bounds {where}
            )"""


def q_value_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution drift of ``value`` between the first
    and second half of the time range, as TOTAL-VARIATION distance over a
    fixed 20-bin histogram: TV = 0.5 * sum_i |p_i - q_i|.

    Drift metrics usually reach for KL/PSI, but ln() is not correctly
    rounded IEEE and differs across libm builds — unverifiable by a hash
    oracle and irreproducible across engines (value_drift_psi now covers
    PSI via the exact fixed-point log2 in functions/fplog2.py; TV remains
    the transcendental-free exact stat). TV needs no transcendental:
    with integer bin counts, sum_i |c1_i*n2 - c2_i*n1| is EXACT integer
    arithmetic (decimal(38,0) headroom for 1e12-row halves), and the one
    final division by 2*n1*n2 is a fixed-order double op. Binning and the
    time split are closed-form from the global min/max (one tiny 1-row
    aggregate broadcast into the scan) — no per-row Python, two shuffles.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    with_bins = _halved_bins(ev, _TV_BINS)
    per_bin = with_bins.groupBy("event_type", "bin").agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    )
    dec = "decimal(38,0)"
    # two-pass form: totals first, then the exact |c1*n2 - c2*n1| sum
    totals = per_bin.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    joined = per_bin.join(F.broadcast(totals), "event_type")
    diff = F.abs(
        F.col("c1").cast(dec) * F.col("n2").cast(dec)
        - F.col("c2").cast(dec) * F.col("n1").cast(dec)
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.sum(diff).alias("num"),
        )
        .select(
            "event_type",
            "n1",
            "n2",
            # NULL when either half has no observations (e.g. an event
            # type introduced mid-window): drift vs "no data" is
            # undefined, and the unguarded division is a hard error
            # under ANSI mode. CASE short-circuits, so the division
            # never evaluates with a zero denominator.
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("num").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n1").cast("double")
                    * F.col("n2").cast("double")
                ),
            ).alias("tv_distance"),
        )
    )


register(
    QuerySpec(
        name="value_drift_tv",
        description="per-type distribution drift as exact total-variation "
        "distance over 20 bins (integer cross-products, no transcendentals)",
        spark=q_value_drift_tv,
        oracle=f"""
            WITH {_halved_bins_sql(_TV_BINS)}, per_bin AS (
                SELECT event_type, bin,
                       count(*) FILTER (WHERE half = 0) AS c1,
                       count(*) FILTER (WHERE half = 1) AS c2
                FROM binned
                GROUP BY event_type, bin
            ), totals AS (
                SELECT event_type,
                       CAST(sum(c1) AS BIGINT) AS n1,
                       CAST(sum(c2) AS BIGINT) AS n2
                FROM per_bin
                GROUP BY event_type
            )
            SELECT p.event_type, n1, n2,
                   CASE WHEN n1 > 0 AND n2 > 0 THEN
                       CAST(sum(abs(CAST(c1 AS HUGEINT) * n2
                                    - CAST(c2 AS HUGEINT) * n1)) AS DOUBLE)
                       / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                   END AS tv_distance
            FROM per_bin p JOIN totals t ON p.event_type = t.event_type
            GROUP BY p.event_type, n1, n2
        """,
    )
)


# ---------------------------------------------------------------------------
# Distribution drift: Population Stability Index (base 2), first vs second
# half — the log-based drift stat the TV query's docstring rules out for
# runtime libm, made oracle-checkable by exact fixed-point log2.
# ---------------------------------------------------------------------------

_PSI_BINS = 20


def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Population Stability Index (base 2) of ``value``
    between the first and second time half, over the same fixed 20-bin
    histogram as value_drift_tv: PSI = sum_i (p_i - q_i) log2(p_i/q_i),
    add-one smoothed over the FULL bin grid.

    This is the stat value_drift_tv declares unverifiable with runtime
    logs; :mod:`..functions.fplog2` removes the libm dependency. The
    log-ratio (L(c1+1)-L(n1+B)) - (L(c2+1)-L(n2+B)) is EXACT int64 in
    1/256-bit units (every argument <= rows+B, so int64-safe at any real
    scale), and the mass difference p_i - q_i is formed as correctly-
    rounded double cross-products — never a >int64 integer — then summed
    as a bin-ordered fold (the daily_trend_slope discipline). No overflow
    horizon, bit-identical across engines.

    Smoothing covers ABSENT bins (empty in both halves they still carry
    smoothed mass when n1 != n2) via a per-type dense bin grid built
    from sequence+explode — no extra scan of events. fp_log2's floor
    error can push near-zero terms slightly negative: PSI >= -0.05
    instead of >= 0 exactly (pinned in tests).
    """
    b_ = _PSI_BINS
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts", "value")
    )
    with_bins = _halved_bins(ev, b_)
    per_bin = with_bins.groupBy("event_type", "bin").agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    )
    totals = per_bin.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    grid = totals.select(
        "event_type",
        "n1",
        "n2",
        F.explode(F.sequence(F.lit(0), F.lit(b_ - 1))).alias("bin"),
    )
    full = (
        grid.join(F.broadcast(per_bin), ["event_type", "bin"], "left")
        .fillna(0, ["c1", "c2"])
        .select(
            "event_type",
            "n1",
            "n2",
            "bin",
            (F.col("c1") + 1).cast("long").alias("c1p"),
            (F.col("c2") + 1).cast("long").alias("c2p"),
            (F.col("n1") + b_).cast("long").alias("n1b"),
            (F.col("n2") + b_).cast("long").alias("n2b"),
        )
    )
    from ..functions.fplog2 import fp_log2

    lr_fp = (fp_log2("c1p") - fp_log2("n1b")) - (
        fp_log2("c2p") - fp_log2("n2b")
    )
    d = (
        F.col("c1p").cast("double") * F.col("n2b").cast("double")
        - F.col("c2p").cast("double") * F.col("n1b").cast("double")
    )
    terms = full.select(
        "event_type",
        "n1",
        "n2",
        "n1b",
        "n2b",
        "bin",
        (d * lr_fp.cast("double")).alias("term"),
    )
    arr = terms.groupBy("event_type", "n1", "n2", "n1b", "n2b").agg(
        F.array_sort(F.collect_list(F.struct("bin", "term"))).alias("a")
    )
    num = F.aggregate(
        F.col("a"), F.lit(0.0), lambda acc, s: acc + s["term"]
    )
    return arr.select(
        "event_type",
        "n1",
        "n2",
        (
            num
            / (
                F.lit(256.0)
                * F.col("n1b").cast("double")
                * F.col("n2b").cast("double")
            )
        ).alias("psi_bits"),
    )


def _psi_oracle() -> str:
    from ..functions.fplog2 import fp_log2_sql

    b_ = _PSI_BINS
    l_c1p = fp_log2_sql("c1p", "duckdb")
    l_c2p = fp_log2_sql("c2p", "duckdb")
    l_n1b = fp_log2_sql("n1b", "duckdb")
    l_n2b = fp_log2_sql("n2b", "duckdb")
    return f"""
        WITH {_halved_bins_sql(b_, where="WHERE value IS NOT NULL")},
        per_bin AS (
            SELECT event_type, bin,
                   count(*) FILTER (WHERE half = 0) AS c1,
                   count(*) FILTER (WHERE half = 1) AS c2
            FROM binned GROUP BY event_type, bin
        ), totals AS (
            SELECT event_type,
                   CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c2) AS BIGINT) AS n2
            FROM per_bin GROUP BY event_type
        ), grid AS (
            SELECT event_type, n1, n2, unnest(range(0, {b_})) AS bin
            FROM totals
        ), filled AS (
            SELECT g.event_type, g.n1, g.n2, g.bin,
                   CAST(COALESCE(p.c1, 0) + 1 AS BIGINT) AS c1p,
                   CAST(COALESCE(p.c2, 0) + 1 AS BIGINT) AS c2p,
                   CAST(g.n1 + {b_} AS BIGINT) AS n1b,
                   CAST(g.n2 + {b_} AS BIGINT) AS n2b
            FROM grid g LEFT JOIN per_bin p
              ON g.event_type = p.event_type AND g.bin = p.bin
        ), terms AS (
            SELECT event_type, n1, n2, n1b, n2b, bin,
                   (CAST(c1p AS DOUBLE) * CAST(n2b AS DOUBLE)
                    - CAST(c2p AS DOUBLE) * CAST(n1b AS DOUBLE))
                   * CAST(({l_c1p} - {l_n1b}) - ({l_c2p} - {l_n2b})
                          AS DOUBLE) AS term
            FROM filled
        ), arr AS (
            SELECT event_type, n1, n2, n1b, n2b,
                   list(term ORDER BY bin) AS a
            FROM terms GROUP BY event_type, n1, n2, n1b, n2b
        )
        SELECT event_type, n1, n2,
               list_reduce(a, (p, q) -> p + q)
               / (256.0 * CAST(n1b AS DOUBLE) * CAST(n2b AS DOUBLE))
                 AS psi_bits
        FROM arr
    """


register(
    QuerySpec(
        name="value_drift_psi",
        description="per-type Population Stability Index (base 2) over "
        "20 bins — exact fixed-point log2 ratios, bin-ordered fold",
        spark=q_value_drift_psi,
        oracle=_psi_oracle(),
    )
)


def q_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per event type
    between the first and second time half: KS = max_x |F1(x) - F2(x)| —
    the binless companion to value_drift_tv (TV sees only 20-bin mass
    moves; KS catches any CDF separation, however the values shift).

    Same exactness discipline as the TV query: the ECDF gap is computed
    as |cum1*n2 - cum2*n1| in decimal(38,0) (exact integer cross-
    products, ~1e12-row headroom per half), the max is order-independent,
    and only the final KS division is a fixed-order double op. The
    running sums order by DISTINCT value within each type — the same
    distinct-value compression spearman_qty_price uses — so the per-type
    sort is bounded by value cardinality, not row count.
    """
    # value IS NOT NULL on BOTH engines: the running sums order by value,
    # and Spark sorts NULLs first while DuckDB defaults to NULLS LAST —
    # a silent cross-engine ECDF shift if nulls ever appear. An ECDF is
    # only defined over observed values anyway.
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .filter(F.col("value").isNotNull())
    )
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t_lo"),
        F.max(F.unix_micros("ts")).alias("t_hi"),
    )
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        (F.unix_micros("ts") >= (F.col("t_lo") + F.col("t_hi")) / F.lit(2))
        .cast("int")
        .alias("half"),
    )
    per_val = halves.groupBy("event_type", "value").agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    )
    totals = per_val.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    gaps = (
        per_val.withColumn("cum1", F.sum("c1").over(w))
        .withColumn("cum2", F.sum("c2").over(w))
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "n1",
            "n2",
            F.abs(
                F.col("cum1").cast(dec) * F.col("n2").cast(dec)
                - F.col("cum2").cast(dec) * F.col("n1").cast(dec)
            ).alias("gap"),
        )
    )
    # null ks_stat when a type is entirely in one half (n1*n2 = 0): under
    # ANSI mode the unguarded double division would abort the whole query
    return gaps.groupBy("event_type").agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.when(
            (F.first("n1") > 0) & (F.first("n2") > 0),
            F.max("gap").cast("double")
            / (F.first("n1").cast("double") * F.first("n2").cast("double")),
        ).alias("ks_stat"),
    )


register(
    QuerySpec(
        name="ks_drift_by_type",
        description="exact two-sample Kolmogorov-Smirnov drift per event "
        "type between time halves (integer ECDF cross-products)",
        spark=q_ks_drift_by_type,
        oracle="""
            WITH bounds AS (
                SELECT min(epoch_us(ts)) AS t_lo, max(epoch_us(ts)) AS t_hi
                FROM events WHERE value IS NOT NULL
            ), halves AS (
                SELECT event_type, value,
                       CAST(epoch_us(ts) >= (t_lo + t_hi) / 2 AS INT) AS half
                FROM events, bounds
                WHERE value IS NOT NULL
            ), per_val AS (
                SELECT event_type, value,
                       count(*) FILTER (WHERE half = 0) AS c1,
                       count(*) FILTER (WHERE half = 1) AS c2
                FROM halves
                GROUP BY event_type, value
            ), totals AS (
                SELECT event_type,
                       CAST(sum(c1) AS BIGINT) AS n1,
                       CAST(sum(c2) AS BIGINT) AS n2
                FROM per_val
                GROUP BY event_type
            ), gaps AS (
                SELECT p.event_type, t.n1, t.n2,
                       abs(CAST(sum(p.c1) OVER w AS HUGEINT) * t.n2
                           - CAST(sum(p.c2) OVER w AS HUGEINT) * t.n1)
                         AS gap
                FROM per_val p JOIN totals t ON p.event_type = t.event_type
                WINDOW w AS (PARTITION BY p.event_type ORDER BY p.value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
            )
            SELECT event_type, n1, n2,
                   CASE WHEN n1 > 0 AND n2 > 0
                        THEN CAST(max(gap) AS DOUBLE)
                             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                        END AS ks_stat
            FROM gaps
            GROUP BY event_type, n1, n2
        """,
    )
)


# ---------------------------------------------------------------------------
# CUSUM drift detector: cumulative-sum change detection over daily volumes
# ---------------------------------------------------------------------------


def q_cusum_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM change detector over daily event volume per type:
    S_d = max(0, S_{d-1} + (x_d - k)), alarm when the cumulative excess
    passes 10% of the mean daily volume — the sequential-analysis
    companion to the two-sample drift pair (value_drift_tv /
    ks_drift_by_type), which only compare fixed halves; CUSUM localizes
    WHEN the level shift happened.

    Exactness: the recursion is non-linear (the max-with-zero clamp), so
    it is rewritten as the max-drawup identity
    ``S_d = P_d - min(0, min_{j<=d} P_j)`` over the prefix sums P of the
    integer residuals — two window passes, no recursion. The reference
    value k is the FLOOR of the mean daily volume (CUSUM's k is a free
    parameter; an integer k keeps every residual x_d - k in exact int64
    micros, with floor division written as (T - pmod(T, n)) / n so both
    engines agree for negative totals too). Prefix sums ride
    decimal(38,0) internally, but the emitted drawup is cast through
    BIGINT first: DuckDB's >2^64 integer->double cast is off by 1 ulp on
    ~1% of values (fuzz-verified, see daily_trend_slope), while int64
    casts are exact on both engines — so the output is bit-identical up
    to a cumulative drawup of 2^63 micros (~9.2e12 value units, decades
    of extreme drift), failing LOUDLY under ANSI past that instead of
    silently hash-diverging.

    Shape: one hash agg on (event_type, day), then all three windows run
    on the same event_type partitioning — two exchanges total; the per-
    type series length is bounded by calendar days, never row count.
    """
    dec = "decimal(38,0)"
    from ..functions.exactmath import scaled_long

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(scaled_long("value", 6)).alias("xm"))
    )
    wt = Window.partitionBy("event_type")
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scoped = daily.select(
        "event_type",
        "day",
        "xm",
        F.count(F.lit(1)).over(wt).alias("n_days"),
        F.sum("xm").over(wt).alias("total"),
    )
    # k = floor(total / n_days): exact-integer floor division via the
    # positive modulus (the numerator is an exact multiple of n_days, so
    # truncating `div` equals floor on both engines for any sign of total;
    # `/` would be DOUBLE division on either engine and rounds past 2^53)
    k = F.expr("(total - pmod(total, n_days)) div n_days")
    prefix = scoped.select(
        "event_type",
        "day",
        "n_days",
        "total",
        F.sum((F.col("xm") - k).cast(dec)).over(wd).alias("p"),
    )
    drawup = prefix.select(
        "event_type",
        "day",
        "n_days",
        "total",
        (
            F.col("p")
            - F.least(F.min("p").over(wd), F.lit(0).cast(dec))
        )
        .cast("long")
        .alias("s"),
    )
    return drawup.select(
        "event_type",
        "day",
        (F.col("s").cast("double") / F.lit(1000000.0)).alias("cusum_excess"),
        (
            F.col("s").cast(dec) * F.col("n_days").cast(dec) * F.lit(10)
            > F.col("total").cast(dec)
        ).alias("alarm"),
    )


register(
    QuerySpec(
        name="cusum_daily_drift",
        description="Page's CUSUM level-shift detector over daily event "
        "volume per type (exact integer max-drawup form, alarm at 10% of "
        "mean daily volume)",
        spark=q_cusum_daily_drift,
        oracle="""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS xm
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, CAST(ts AS DATE)
            ), scoped AS (
                SELECT *,
                       count(*) OVER wt AS n_days,
                       CAST(sum(xm) OVER wt AS BIGINT) AS total
                FROM daily
                WINDOW wt AS (PARTITION BY event_type)
            ), prefix AS (
                SELECT *,
                       sum(CAST(xm - (total - ((total % n_days + n_days)
                                               % n_days)) // n_days
                                AS HUGEINT)) OVER wd AS p
                FROM scoped
                WINDOW wd AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
            ), drawup AS (
                SELECT *,
                       CAST(p - least(min(p) OVER wd, 0) AS BIGINT) AS s
                FROM prefix
                WINDOW wd AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
            )
            SELECT event_type, day,
                   CAST(s AS DOUBLE) / 1000000.0 AS cusum_excess,
                   (CAST(s AS HUGEINT) * n_days * 10 > total) AS alarm
            FROM drawup
        """,
    )
)


# ---------------------------------------------------------------------------
# OLS trend per event type: fixed-order fold moments, exact daily inputs
# ---------------------------------------------------------------------------


def q_daily_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of daily volume over time:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with x = epoch day number
    and y = exact daily volume in int64 micros — the regression companion
    to cusum_daily_drift (CUSUM says WHEN the level shifted; the slope
    says how fast the level is moving, plus r^2 for how linear it is).

    Determinism: built-in regr_slope/corr aggregate doubles in partition
    order — not hash-oracle-able. Exact decimal(38,0) moments don't work
    either, for a subtler reason: Syy reaches ~1e25 and DuckDB's
    >2^64 integer->double cast is NOT correctly rounded (verified: 1-ulp
    off on ~1% of 65..120-bit values, e.g. 267624684374100000000), so the
    exact moment hashes diverge at the final cast. Instead the day-sorted
    daily series is collected per type (bounded by CALENDAR DAYS, never
    row count) and every moment is a left-to-right double fold over it —
    each element an exact int64->double conversion (< 2^53), every
    product/sum IEEE ops in an identical fixed order on both engines.
    One daily hash agg + one per-type array agg: two exchanges.
    """
    from ..functions.exactmath import scaled_long

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(scaled_long("value", 6)).alias("ym"))
        .select(
            "event_type",
            F.datediff(F.col("day"), F.lit("1970-01-01"))
            .cast("double")
            .alias("x"),
            F.col("ym").cast("double").alias("y"),
        )
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("x", "y"))).alias("a")
    )

    def fold(term):
        return F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, s: acc + term(s)
        )

    n = F.size("a").cast("double")
    sx = fold(lambda s: s["x"])
    sy = fold(lambda s: s["y"])
    sxy = fold(lambda s: s["x"] * s["y"])
    sxx = fold(lambda s: s["x"] * s["x"])
    syy = fold(lambda s: s["y"] * s["y"])
    moments = arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        n.alias("n"),
        sx.alias("sx"),
        sy.alias("sy"),
        sxy.alias("sxy"),
        sxx.alias("sxx"),
        syy.alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return moments.select(
        "event_type",
        "n_days",
        ((F.col("sy") / F.col("n")) / F.lit(1000000.0)).alias("mean_daily"),
        F.when(den_x > 0, (num / den_x) / F.lit(1000000.0)).alias(
            "slope_per_day"
        ),
        F.when((den_x > 0) & (den_y > 0), (num * num) / (den_x * den_y)).alias(
            "r2"
        ),
    )


register(
    QuerySpec(
        name="daily_trend_slope",
        description="per-event-type OLS trend of daily volume (exact "
        "int64 daily sums, fixed-order double fold moments, r^2)",
        spark=q_daily_trend_slope,
        oracle="""
            WITH daily AS (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                         AS x,
                       CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS y
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, CAST(ts AS DATE)
            ), arr AS (
                SELECT event_type,
                       list(struct_pack(x := CAST(x AS DOUBLE),
                                        y := CAST(y AS DOUBLE))
                            ORDER BY x) AS a
                FROM daily GROUP BY event_type
            ), moments AS (
                SELECT event_type,
                       CAST(len(a) AS BIGINT) AS n_days,
                       CAST(len(a) AS DOUBLE) AS n,
                       list_reduce(list_transform(a, s -> s.x),
                                   (p, q) -> p + q) AS sx,
                       list_reduce(list_transform(a, s -> s.y),
                                   (p, q) -> p + q) AS sy,
                       list_reduce(list_transform(a, s -> s.x * s.y),
                                   (p, q) -> p + q) AS sxy,
                       list_reduce(list_transform(a, s -> s.x * s.x),
                                   (p, q) -> p + q) AS sxx,
                       list_reduce(list_transform(a, s -> s.y * s.y),
                                   (p, q) -> p + q) AS syy
                FROM arr
            )
            SELECT event_type, n_days,
                   (sy / n) / 1000000.0 AS mean_daily,
                   CASE WHEN (n * sxx - sx * sx) > 0 THEN
                     ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 1000000.0
                   END AS slope_per_day,
                   CASE WHEN (n * sxx - sx * sx) > 0
                         AND (n * syy - sy * sy) > 0 THEN
                     ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                   END AS r2
            FROM moments
        """,
    )
)


# ---------------------------------------------------------------------------
# EWMA daily level: exponential smoothing of daily volume, last-day alarm
# ---------------------------------------------------------------------------

#: Smoothing factor as an exact dyadic rational (0.3 would round): alpha =
#: 77/256 ~ 0.3. Both engines multiply by the same literal doubles.
_EWMA_ALPHA = 77.0 / 256.0


def q_ewma_daily_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exponentially weighted moving average of daily
    volume: y_t = alpha*x_t + (1-alpha)*y_{t-1}, y_0 = x_0 — the
    smoothed "normal level" a monitoring stack compares each new day
    against. Output: final level, last-day volume, their ratio, and an
    alarm when the last day runs >=1.5x the smoothed level (the batch
    twin of the streaming PSI monitor's alarm, for VOLUME rather than
    distribution shape).

    Determinism: daily sums are exact int64 micros; the EWMA recursion
    is inherently order-dependent, so it runs as a left fold over the
    day-sorted collected series — seeded with the FIRST element on both
    engines (Spark folds slice(a, 2, ...) from a[0]; DuckDB list_reduce
    seeds with element 1 natively). Bounded by calendar days, like
    daily_trend_slope.
    """
    from ..functions.exactmath import scaled_long

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(scaled_long("value", 6)).alias("ym"))
        .select(
            "event_type",
            F.struct(
                "day", (F.col("ym").cast("double") / 1000000.0).alias("x")
            ).alias("s"),
        )
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list("s")).alias("a")
    )
    xs = F.transform(F.col("a"), lambda s: s["x"])
    ewma = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(_EWMA_ALPHA) * x
        + F.lit(1.0 - _EWMA_ALPHA) * acc,
    )
    last = F.element_at(xs, -1)
    out = arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        ewma.alias("ewma_level"),
        last.alias("last_day"),
    )
    ratio = F.when(
        F.col("ewma_level") > 0, F.col("last_day") / F.col("ewma_level")
    )
    return out.select(
        "event_type",
        "n_days",
        "ewma_level",
        "last_day",
        ratio.alias("last_to_level"),
        (ratio >= 1.5).alias("alarm"),
    )


register(
    QuerySpec(
        name="ewma_daily_level",
        description="per-type EWMA of daily volume (first-element-seeded "
        "ordered fold) with last-day volume alarm",
        spark=q_ewma_daily_level,
        oracle=f"""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT)) AS DOUBLE) / 1000000.0
                         AS x
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, CAST(ts AS DATE)
            ), arr AS (
                SELECT event_type, list(x ORDER BY day) AS xs
                FROM daily GROUP BY event_type
            ), m AS (
                SELECT event_type,
                       CAST(len(xs) AS BIGINT) AS n_days,
                       list_reduce(xs,
                           (acc, x) -> {_EWMA_ALPHA!r} * x
                                       + {1.0 - _EWMA_ALPHA!r} * acc)
                         AS ewma_level,
                       xs[-1] AS last_day
                FROM arr
            )
            SELECT event_type, n_days, ewma_level, last_day,
                   CASE WHEN ewma_level > 0
                        THEN last_day / ewma_level END AS last_to_level,
                   CASE WHEN ewma_level > 0
                        THEN last_day / ewma_level >= 1.5 END AS alarm
            FROM m
        """,
    )
)


# ---------------------------------------------------------------------------
# Weekly seasonality index: day-of-week volume profile per event type
# ---------------------------------------------------------------------------


def q_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ISO-day-of-week seasonality index: mean daily
    volume on that weekday divided by the overall mean daily volume
    (1.0 = flat week). The profile a forecaster divides out before
    trend/drift detection — and the reason a Sunday dip is not an
    incident.

    Exactness: per-day sums are exact int64 micros; the index is a ratio
    of two exact-integer means, evaluated in a fixed division order on
    both engines. Weekday numbering is pinned to ISO (1=Mon..7=Sun):
    Spark ``weekday()+1`` == DuckDB ``isodow()`` (DuckDB's ``dayofweek``
    is 0=Sunday — a silent off-by-one if used naively).

    Scale: one daily hash agg, one (type, dow) rollup of <= 7 rows per
    type, one broadcast of per-type totals. Nothing holds more than the
    calendar.
    """
    from ..functions.exactmath import scaled_long

    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(scaled_long("value", 6)).alias("ym"))
    )
    by_dow = daily.groupBy(
        "event_type", (F.weekday("day") + 1).alias("iso_dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("ym").alias("ym_dow"),
    )
    totals = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_all"),
        F.sum("ym").alias("ym_all"),
    )
    j = by_dow.join(F.broadcast(totals), "event_type")
    dow_mean = F.col("ym_dow").cast("double") / F.col("n_days").cast("double")
    all_mean = (
        F.col("ym_all").cast("double") / F.col("n_days_all").cast("double")
    )
    return j.select(
        "event_type",
        "iso_dow",
        "n_days",
        (dow_mean / 1000000.0).alias("mean_daily_dow"),
        (dow_mean / all_mean).alias("seasonality_index"),
    )


register(
    QuerySpec(
        name="weekly_seasonality_index",
        description="per-type ISO day-of-week volume profile: mean daily "
        "volume per weekday / overall mean (exact integer daily sums)",
        spark=q_weekly_seasonality,
        oracle="""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS ym
                FROM events WHERE value IS NOT NULL
                GROUP BY event_type, CAST(ts AS DATE)
            ), by_dow AS (
                SELECT event_type, CAST(isodow(day) AS INT) AS iso_dow,
                       count(*) AS n_days,
                       CAST(sum(ym) AS BIGINT) AS ym_dow
                FROM daily GROUP BY event_type, isodow(day)
            ), totals AS (
                SELECT event_type, count(*) AS n_days_all,
                       CAST(sum(ym) AS BIGINT) AS ym_all
                FROM daily GROUP BY event_type
            )
            SELECT b.event_type, b.iso_dow, b.n_days,
                   (CAST(ym_dow AS DOUBLE) / CAST(b.n_days AS DOUBLE))
                     / 1000000.0 AS mean_daily_dow,
                   (CAST(ym_dow AS DOUBLE) / CAST(b.n_days AS DOUBLE))
                   / (CAST(ym_all AS DOUBLE) / CAST(n_days_all AS DOUBLE))
                     AS seasonality_index
            FROM by_dow b JOIN totals t ON b.event_type = t.event_type
        """,
    )
)


# ---------------------------------------------------------------------------
# Event transition matrix: first-order Markov census over per-user sequences
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of event types along each user's
    event sequence: for consecutive events (by time) of the same user,
    count prev_type -> curr_type and the row-normalized transition
    probability — the sequence-analytics census behind "what do users do
    after X" and Markov-chain session simulators.

    Ordering is pinned (ts, event_id) so ties are deterministic, and
    rows with a NULL ts OR event_id are excluded on both engines (Spark
    sorts NULLs first, DuckDB last — a silent sequence shift otherwise,
    on the tiebreaker as much as on the key). Counts are
    exact ints; the probability is one correctly-rounded division.

    Scale: one shuffle to sequence per user (window), one hash agg of
    |types|^2 pairs, marginals broadcast back onto the tiny matrix.
    """
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("curr_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "curr_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # window marginal over the tiny |types|^2 matrix — a groupBy+join
    # would re-execute the whole sequence subtree for the second branch
    n_prev = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "curr_type",
        "n",
        (F.col("n").cast("double") / n_prev.cast("double")).alias("p"),
    )


register(
    QuerySpec(
        name="event_transition_matrix",
        description="first-order Markov transition counts/probabilities "
        "over per-user event sequences (deterministic tie order)",
        spark=q_event_transitions,
        oracle="""
            WITH seq AS (
                SELECT user_id,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                         AS prev_type,
                       event_type AS curr_type
                FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
            ),
            pairs AS (
                SELECT prev_type, curr_type, count(*) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY prev_type, curr_type
            ),
            marg AS (
                SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_prev
                FROM pairs GROUP BY prev_type
            )
            SELECT p.prev_type, p.curr_type, p.n,
                   CAST(p.n AS DOUBLE) / CAST(m.n_prev AS DOUBLE) AS p
            FROM pairs p JOIN marg m ON p.prev_type = m.prev_type
        """,
    )
)


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap: distributed CI without RNG state
# ---------------------------------------------------------------------------

_BOOT_B = 100
#: order statistics of the sorted resample means for a 95% interval
#: (1-indexed): derived from _BOOT_B so changing B keeps the coverage.
#: ceil for the lower bound (never round(), whose banker's mode turns
#: 2.5 into 2), upper by symmetry.
_BOOT_LO = max(1, math.ceil(0.025 * _BOOT_B))
_BOOT_HI = _BOOT_B + 1 - _BOOT_LO

#: Cumulative Poisson(1) thresholds for the inverse-CDF weight ladder,
#: computed ONCE in Python and embedded as the same literals in both
#: engines (the Benford shared-literal discipline — no runtime exp()).
_POIS_CDF: tuple[float, ...] = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)


def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via the
    Poisson bootstrap (the only bootstrap that distributes: each of B
    resamples weights every row by an independent Poisson(1) draw, no
    global sampling pass) — made fully DETERMINISTIC: the draw is the
    inverse CDF applied to u = h60(orderkey:b)/2^60, so every engine,
    run, and retry produces the identical resample.

    Exactness: u is a correctly-rounded int->double conversion —
    identical rounding in Spark, DuckDB, and Python (values above 2^53
    round, but identically everywhere) — and an exponent-shift division;
    the CDF ladder thresholds are shared build-time
    literals; per-resample means are ratios of exact int64 sums
    (weighted cents / weights); the interval is order statistics 3 and
    98 of the B=100 sorted means (~2.5%/97.5%), exact on both engines.

    Scale: the B-fold explode is the bootstrap's honest cost; weighted
    sums map-side combine to B rows per task, so the one shuffle carries
    B rows per partition regardless of input size.
    """
    from ..functions.exactmath import scaled_long
    from ..operators.layout import spread_if_narrow

    # The B-fold explode feeds B md5 evaluations per order into the SCAN
    # stage, whose width is the file-split count — a one-file sf0.1 scan
    # ran 15M hashes on 1 core (measured 25 s; ~2 s spread). Same guard
    # as every other CPU-heavy map stage.
    orders = spread_if_narrow(_t(spark, sf_dir, "orders")).select(
        "o_orderkey", scaled_long("o_totalprice", 2).alias("cents")
    )
    u = (
        X.h60(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    w = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    per_b = (
        orders.select(
            "o_orderkey",
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wc"),
            F.sum("w").alias("ws"),
        )
        .select(
            "b",
            (
                F.col("wc").cast("double") / F.col("ws").cast("double")
            ).alias("mean_b"),
        )
    )
    booted = per_b.agg(
        F.array_sort(F.collect_list("mean_b")).alias("ms")
    )
    full = orders.agg(
        F.sum("cents").alias("tc"), F.count(F.lit(1)).alias("n")
    )
    return (
        booted.crossJoin(F.broadcast(full))
        .select(
            F.col("n").alias("n_orders"),
            F.lit(_BOOT_B).alias("n_boot"),
            (
                F.col("tc").cast("double")
                / F.col("n").cast("double")
                / F.lit(100.0)
            ).alias("mean_value"),
            (F.element_at("ms", _BOOT_LO) / F.lit(100.0)).alias("ci_lo"),
            (F.element_at("ms", _BOOT_HI) / F.lit(100.0)).alias("ci_hi"),
        )
    )


def _bootstrap_oracle() -> str:
    ladder = f"{len(_POIS_CDF)}"
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        ladder = f"CASE WHEN u < {_POIS_CDF[k]!r} THEN {k} ELSE {ladder} END"
    return f"""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                     AS cents
            FROM orders
        ),
        ex AS (
            SELECT o_orderkey, cents, unnest(range(0, {_BOOT_B})) AS b
            FROM o
        ),
        uw AS (
            SELECT b, cents,
                   CAST({h60_sql(
                       "CAST(o_orderkey AS VARCHAR) || ':' "
                       "|| CAST(b AS VARCHAR)"
                   )} AS DOUBLE) / {float(1 << 60)!r} AS u
            FROM ex
        ),
        wt AS (SELECT b, cents, ({ladder}) AS w FROM uw),
        per_b AS (
            SELECT b,
                   CAST(CAST(sum(w * cents) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS mean_b
            FROM wt GROUP BY b
        ),
        booted AS (
            SELECT list(mean_b ORDER BY mean_b) AS ms FROM per_b
        ),
        full_ AS (
            SELECT CAST(sum(cents) AS BIGINT) AS tc, count(*) AS n FROM o
        )
        SELECT n AS n_orders, {_BOOT_B} AS n_boot,
               CAST(tc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                 AS mean_value,
               ms[{_BOOT_LO}] / 100.0 AS ci_lo,
               ms[{_BOOT_HI}] / 100.0 AS ci_hi
        FROM booted, full_
    """


register(
    QuerySpec(
        name="bootstrap_mean_ci",
        description="95% CI for mean order value via deterministic "
        "Poisson bootstrap (hash-derived weights, exact order statistics)",
        spark=q_bootstrap_mean_ci,
        oracle=_bootstrap_oracle(),
    )
)


# ---------------------------------------------------------------------------
# Inter-arrival quartiles: arrival-process health per event type
# ---------------------------------------------------------------------------


def q_interarrival_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of the inter-arrival gap (seconds) between consecutive
    events of each type — the arrival-process health check behind rate
    alarms and capacity planning (a fattening p75 is the early sign of a
    stalling producer; the reference's only arrival model is its
    5-10 ms replay pacing, BASELINE.md).

    Gaps are exact integer micros from a lag window ordered by
    (ts, event_id) with NULL keys excluded (cross-engine NULL sort order,
    as pinned by event_transition_matrix); quartiles come from the GK
    sketch in its exact regime (licensed by approx_quantiles_by_type) and
    equal DuckDB's quantile_disc; the only float op is the final /1e6.

    Scale: one shuffle to order per type, one map-side-combined sketch
    agg — the sort is per event type, never global.
    """
    from .relational import _GK_ACCURACY

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select("event_type", "ts", "event_id")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    q = F.percentile_approx("gap_us", [0.25, 0.5, 0.75], _GK_ACCURACY)
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.element_at(q, 1).cast("double") / 1000000.0).alias("p25_s"),
        (F.element_at(q, 2).cast("double") / 1000000.0).alias("p50_s"),
        (F.element_at(q, 3).cast("double") / 1000000.0).alias("p75_s"),
    )


register(
    QuerySpec(
        name="interarrival_quartiles",
        description="per-type inter-arrival gap quartiles (exact micros; "
        "GK sketch exact while per-type rows <= 50k accuracy — bound "
        "asserted per-SF in tests/test_properties.py) — arrival-process "
        "health",
        spark=q_interarrival_quartiles,
        oracle="""
            WITH seq AS (
                SELECT event_type,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                       ) AS gap_us
                FROM events
                WHERE ts IS NOT NULL AND event_id IS NOT NULL
            )
            SELECT event_type, count(*) AS n_gaps,
                   CAST(quantile_disc(gap_us, 0.25) AS DOUBLE) / 1000000.0
                     AS p25_s,
                   CAST(quantile_disc(gap_us, 0.5) AS DOUBLE) / 1000000.0
                     AS p50_s,
                   CAST(quantile_disc(gap_us, 0.75) AS DOUBLE) / 1000000.0
                     AS p75_s
            FROM seq WHERE gap_us IS NOT NULL
            GROUP BY event_type
        """,
    )
)


# ---------------------------------------------------------------------------
# Rolling 7-day median: windowed GK sketch over a RANGE frame
# ---------------------------------------------------------------------------


def q_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day median of event value per type, one row per
    (type, day) — rolling ROBUST level tracking, the median twin of
    trailing_week_revenue's sum and the robust companion to
    ewma_daily_level (a fat-tailed burst moves the mean and the EWMA;
    the rolling median shrugs it off).

    The GK sketch runs as a WINDOW aggregate over a day-ranged frame
    (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW on the epoch-day
    number) — each frame holds at most 7 days of one type's events,
    comfortably inside the sketch's exact regime, where its result
    equals DuckDB's quantile_disc over the identical frame (the
    licensing approx_quantiles_by_type pinned). Frames are bounded by
    the calendar, so no partition ever holds more than the type's
    7-day row count regardless of corpus size.
    """
    from .relational import _GK_ACCURACY

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long")
            .alias("epoch_day"),
            "value",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("epoch_day")
        .rangeBetween(-6, 0)
    )
    return ev.select(
        "event_type",
        "epoch_day",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.percentile_approx("value", 0.5, _GK_ACCURACY)
        .over(w)
        .alias("p50_value"),
    ).distinct()


register(
    QuerySpec(
        name="rolling_median_7d",
        description="trailing-7-day median of event value per type "
        "(windowed GK sketch over a day-RANGE frame; exact while any "
        "7-day frame holds <= 50k accuracy rows — bound asserted per-SF "
        "in tests/test_properties.py)",
        spark=q_rolling_median_7d,
        oracle="""
            SELECT DISTINCT event_type, epoch_day,
                   count(*) OVER w AS n_window,
                   quantile_disc(value, 0.5) OVER w AS p50_value
            FROM (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                         AS epoch_day,
                       value
                FROM events WHERE value IS NOT NULL
            )
            WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
    )
)


# ---------------------------------------------------------------------------
# Winsorized mean: robust level after clipping tails at p05/p95
# ---------------------------------------------------------------------------


def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized mean of event value: clip at the type's
    p05/p95 (GK exact regime, cuts on exact micros) and average the
    clipped values — the robust mean that keeps tail rows (unlike
    trimming) but caps their influence; reported next to the raw mean
    and the fraction clipped.

    Everything except the final divisions is exact int64: values are
    scaled micros, clipping is least/greatest on integers, sums are
    integer sums — so the winsorized mean is a ratio of exact integers,
    bit-identical across engines (the plain-mean comparison too).
    """
    from ..functions.exactmath import scaled_long
    from .relational import _GK_ACCURACY

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", scaled_long("value", 6).alias("vm"))
    )
    q = F.percentile_approx("vm", [0.05, 0.95], _GK_ACCURACY)
    cuts = ev.groupBy("event_type").agg(
        F.element_at(q, 1).alias("c05"), F.element_at(q, 2).alias("c95")
    )
    j = ev.join(F.broadcast(cuts), "event_type")
    clipped = F.least(F.greatest(F.col("vm"), F.col("c05")), F.col("c95"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("vm").cast("double") / F.count(F.lit(1)).cast("double")
         / F.lit(1000000.0)).alias("mean_raw"),
        (F.sum(clipped).cast("double") / F.count(F.lit(1)).cast("double")
         / F.lit(1000000.0)).alias("mean_winsorized"),
        (
            F.count_if((F.col("vm") < F.col("c05"))
                       | (F.col("vm") > F.col("c95"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("clipped_frac"),
    )


register(
    QuerySpec(
        name="winsorized_mean_by_type",
        description="per-type winsorized mean (p05/p95 clip on exact "
        "micros; GK cuts exact while per-type rows <= 50k accuracy — "
        "bound asserted per-SF in tests/test_properties.py) vs raw mean, "
        "with clipped fraction",
        spark=q_winsorized_mean,
        oracle="""
            WITH ev AS (
                SELECT event_type,
                       CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vm
                FROM events WHERE value IS NOT NULL
            ),
            cuts AS (
                SELECT event_type,
                       quantile_disc(vm, 0.05) AS c05,
                       quantile_disc(vm, 0.95) AS c95
                FROM ev GROUP BY event_type
            )
            SELECT e.event_type, count(*) AS n,
                   CAST(CAST(sum(vm) AS BIGINT) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_raw,
                   CAST(CAST(sum(least(greatest(vm, c05), c95)) AS BIGINT)
                        AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 1000000.0
                     AS mean_winsorized,
                   CAST(count(*) FILTER (WHERE vm < c05 OR vm > c95)
                        AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS clipped_frac
            FROM ev e JOIN cuts c ON e.event_type = c.event_type
            GROUP BY e.event_type
        """,
    )
)
