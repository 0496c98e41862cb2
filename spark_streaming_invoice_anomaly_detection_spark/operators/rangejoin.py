"""Bucketed time-range join (SURVEY.md §2.3 additions; no reference
counterpart — the reference has no joins at all, see SURVEY.md §2.3 note).

A range predicate ``|a.ts - b.ts| <= gap`` is a theta-join: Spark would
plan it as BroadcastNestedLoopJoin (or a cartesian product), which is
O(n*m) — a scale-killer long before 100 TB. The classic fix is to
coarse-quantize time into buckets of exactly the gap width and equi-join
on the bucket id:

- every qualifying pair is at most one bucket apart, so exploding ONE side
  to its bucket and both neighbors (b-1, b, b+1) guarantees each
  qualifying pair meets on exactly one equi-key (``left_bucket`` equals
  exactly one of the three right-side candidates);
- the bucket id becomes an ordinary shuffle/join key: sort-merge or
  broadcast applies, AQE handles skew, and the residual exact-range filter
  runs post-join on a candidate set that is ~3*density instead of n*m.

The 3x explode is the entire overhead; there is no duplicate elimination
step because the equi-match is unique per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_time_bucket(
    df: DataFrame, ts_us_col: str, width_us: int, out_col: str = "_bucket"
) -> DataFrame:
    """Integer bucket id: ``ts_us div width_us`` (exact int64 arithmetic —
    never a double round-trip, which loses integer precision past 2^53)."""
    return df.withColumn(out_col, F.expr(f"`{ts_us_col}` div {int(width_us)}"))


def bucketed_time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts_us: str,
    right_ts_us: str,
    max_gap_us: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join rows with ``|left.ts - right.ts| <= max_gap_us`` via bucket
    equi-join; ``extra_cond`` (e.g. a key inequality) is applied with the
    range filter, after the equi-join pruned candidates.

    Column names of ``left`` and ``right`` must be disjoint (rename before
    calling) so the output keeps both sides addressable.
    """
    w = int(max_gap_us)
    l = with_time_bucket(left, left_ts_us, w, "_lb")
    r = with_time_bucket(right, right_ts_us, w, "_rb").withColumn(
        "_lb", F.explode(F.array(F.col("_rb") - 1, F.col("_rb"), F.col("_rb") + 1))
    )
    joined = l.join(r, "_lb")
    in_range = (
        F.abs(F.col(left_ts_us) - F.col(right_ts_us)) <= F.lit(w)
    )
    if extra_cond is not None:
        in_range = in_range & extra_cond
    return joined.filter(in_range).drop("_lb", "_rb")


__all__ = ["with_time_bucket", "bucketed_time_range_join"]
