"""Mergeable-sketch operators: DataSketches HLL rollups and Count-Min
frequency sketches.

Why sketches are a first-class operator family at 100 TB: exact
COUNT(DISTINCT) shuffles every distinct key, and — worse — cannot be
*incrementally maintained*: yesterday's exact count is useless for today's
rollup without rescanning yesterday's data. A sketch is a small, bounded
binary state that (a) aggregates with map-side partial merge, so the
shuffle carries one ~kB object per (partition, group), and (b) can be
PERSISTED and re-merged later: materialize per-day sketches once, then
answer any date-range distinct query by unioning the stored sketches —
no rescan of the raw 100 TB. That storable-partial property is what
`approx_count_distinct` (plans/advanced.py:q_approx_distinct_users) does
NOT give you: it fuses sketch build and estimate into one query.

Operators:

- ``distinct_sketches``: groupBy + ``hll_sketch_agg`` — the storable
  partial (Apache DataSketches HLL, register-wise-max merge, order
  independent and therefore deterministic for a fixed input set).
- ``rollup_distinct``: ``hll_union_agg`` over stored sketches + estimate —
  the re-merge path.
- ``cms_sketch`` / ``parse_cms``: Spark's Count-Min sketch aggregate and a
  pure-Python parser for its public serialization (version, totalCount,
  depth, width, hash seeds, counter table — all big-endian, see Spark's
  ``common/sketch`` CountMinSketchImpl.writeTo). The parsed totalCount is
  EXACT (every insert increments it), which is what lets a CMS query carry
  a full SQL oracle even though the counters are approximate.

No reference counterpart (the reference's only distinct-ish shape is the
exact top-2000 threshold, Clustering.scala); this family is the
incremental-rollup path a 100 TB deployment leans on.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default HLL precision: 2^12 registers -> ~1.6% relative standard error,
#: 4 KiB dense sketch. The standard accuracy/size trade for per-group
#: rollups (per-group state stays small enough to broadcast if needed).
DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Storable HLL partial: one binary sketch per group.

    One shuffle on ``group_cols``; partial sketches merge map-side (the
    aggregation buffer is the sketch itself), so shuffle volume is
    O(groups x 2^lg_k bytes), independent of input rows. Persist the
    result to parquet to enable rescan-free date-range rollups.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Re-merge stored sketches to a coarser grain and estimate.

    ``hll_union_agg`` is register-wise max — associative, commutative,
    idempotent — so unioning per-day sketches yields BIT-IDENTICAL state
    to having sketched the union directly (pinned in
    tests/test_sketches.py). Estimation is the only lossy step.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias(estimate_col)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_agg(
    value_col: str | Column, eps: float, confidence: float, seed: int
) -> Column:
    """``count_min_sketch`` aggregate column (binary, mergeable)."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.count_min_sketch(
        col, F.lit(eps), F.lit(confidence), F.lit(seed)
    )


def cms_depth_width(eps: float, confidence: float) -> tuple[int, int]:
    """Spark's CMS sizing (common/sketch CountMinSketchImpl ctor):
    depth = ceil(-ln(1-confidence)/ln 2), width = ceil(2/eps)."""
    depth = math.ceil(-math.log(1 - confidence) / math.log(2))
    width = math.ceil(2 / eps)
    return depth, width


@dataclass(frozen=True)
class CmsSketch:
    version: int
    total_count: int
    depth: int
    width: int
    hash_seeds: tuple[int, ...]
    # counters[d][w]; each row sums to total_count (every insert touches
    # exactly one counter per row) — the structural invariant tests pin.
    counters: tuple[tuple[int, ...], ...]


def parse_cms(data: bytes) -> CmsSketch:
    """Parse Spark's CMS wire format (big-endian, version 1).

    Layout (CountMinSketchImpl.writeTo): int version, long totalCount,
    int depth, int width, depth x long hash seeds, depth*width x long
    counters. Pure stdlib so executors and tests share it without numpy.
    """
    version, total, depth, width = struct.unpack_from(">iqii", data, 0)
    off = 20
    seeds = struct.unpack_from(f">{depth}q", data, off)
    off += 8 * depth
    counters = []
    for _ in range(depth):
        counters.append(struct.unpack_from(f">{width}q", data, off))
        off += 8 * width
    if off != len(data):
        raise ValueError(f"CMS parse: {len(data) - off} trailing bytes")
    return CmsSketch(version, total, depth, width, seeds, tuple(counters))


def cms_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float,
    confidence: float,
    seed: int,
) -> DataFrame:
    """Per-group CMS with its deterministic envelope parsed out:
    (group, depth, width, total_count, sketch_bytes).

    ``total_count`` is exact by construction and ``depth``/``width``/
    ``sketch_bytes`` are pure functions of (eps, confidence) — so this
    query carries a FULL SQL oracle despite being sketch-backed. The parse
    runs in an Arrow-batched ``mapInPandas`` over the already-aggregated
    frame (one row per group — Python touches O(groups), never O(rows));
    the function closes over nothing module-level so cloudpickle ships it
    by value (driver workers lack this package on sys.path).
    """
    agged = df.groupBy(*group_cols).agg(
        cms_agg(value_col, eps, confidence, seed).alias("sketch")
    )
    # group columns keep their ACTUAL types (a hardcoded string schema
    # would make Arrow conversion fail for int/date group keys)
    out_schema = (
        ", ".join(
            f"{c} {agged.schema[c].dataType.simpleString()}" for c in group_cols
        )
        + ", depth int, width int, total_count long, sketch_bytes int"
    )
    gcols = list(group_cols)

    def parse_batches(batches):
        import struct as _struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["sketch"])
                _, total, depth, width = _struct.unpack_from(">iqii", data, 0)
                rows.append(
                    [r[c] for c in gcols] + [depth, width, total, len(data)]
                )
            yield pd.DataFrame(
                rows,
                columns=gcols + ["depth", "width", "total_count", "sketch_bytes"],
            )

    return agged.mapInPandas(parse_batches, schema=out_schema)


__all__ = [
    "DEFAULT_LG_K",
    "CmsSketch",
    "cms_agg",
    "cms_depth_width",
    "cms_summary",
    "distinct_sketches",
    "parse_cms",
    "rollup_distinct",
]
