"""General-purpose streaming operators beyond the reference pipeline.

The reference's streaming surface is the invoice pipeline only (SURVEY.md
§2.4); a complete engine also needs the two workhorse stateful shapes every
Structured Streaming deployment hits:

- ``dedup_within_watermark``: exactly-once-per-key emission with bounded
  state — the streaming twin of the batch exact-dedup operator
  (operators/dedup.py). State is dropped once the watermark passes a key's
  event time, so memory is proportional to the watermark horizon, not the
  stream's history — the property that matters at 100 TB/day.
- ``interval_join``: stream-stream equi-join with a time-bound predicate.
  Both sides are watermarked and the join condition bounds event-time
  distance, so Spark can expire buffered rows; an unbounded stream-stream
  join would grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): unlike plain
    ``dropDuplicates`` on a streaming frame, state for a key is released
    as soon as the watermark passes its event time, keeping the dedup map
    bounded. Duplicates farther apart than the watermark are NOT caught —
    that's the (documented) contract; batch exact_dedup is the full pass.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 seconds",
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows share ``key`` and the right event lands in
    ``[left_ts, left_ts + within]``.

    The time bound plus both watermarks let the state store evict buffered
    rows once they can no longer match — the join's state is
    O(input rate x (watermark + within)), independent of stream length.
    Column names must be disjoint apart from ``key`` (rename first).

    ``how="leftOuter"`` additionally emits unmatched left rows (right side
    null) once the watermark proves no match can still arrive — the
    "purchase with no click attribution" shape; outer emission latency is
    therefore watermark-bounded, not immediate.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        f"{left_ts} <= {right_ts} AND {right_ts} <= {left_ts} + interval {within}"
    )
    return l.join(r, F.expr(cond) & (l[key] == r[key]), how).drop(r[key])


__all__ = ["dedup_within_watermark", "interval_join"]
