"""Streaming distribution-drift monitor: windowed PSI vs a trained baseline.

The reference's serving pattern is train-offline / score-online
(Clustering.scala trains KMeans + threshold, InvoicePipeline.scala:501-511
broadcasts them into the stream). This module applies the same pattern to
DISTRIBUTION drift: a histogram baseline is fitted on batch data, embedded
as literals, and every event-time window of the stream is scored with the
Population Stability Index against it — the standard "has the input
distribution shifted since the model was trained" alarm that pairs with
any deployed model.

PSI uses the exact fixed-point log2 (:mod:`..functions.fplog2`), identical
to the batch ``value_drift_psi`` query: the baseline-side logs are
Python-time constants, the stream-side logs are exact int64 expressions,
so a window's PSI is bit-reproducible given its bin counts (pinned in
tests against a pure-Python recomputation).

Scale: ONE stateful aggregation per window (20 conditional counts,
map-side combined), then pure per-row expressions — state is
O(windows in flight), the baseline ships as plan literals, nothing is
broadcast or joined at runtime. Append mode with a watermark works on
Spark 3.4+; the composed tests drive it with availableNow (safe here:
no applyInPandasWithState timeouts involved).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fplog2 import fp_log2, fp_log2_py


@dataclass(frozen=True)
class HistogramBaseline:
    """Fitted value histogram: closed-form bin edges + per-bin counts."""

    v_lo: float
    v_hi: float
    counts: tuple[int, ...]

    @property
    def bins(self) -> int:
        return len(self.counts)

    @property
    def total(self) -> int:
        return sum(self.counts)


def histogram_baseline(
    df: DataFrame, value_col: str, bins: int = 20
) -> HistogramBaseline:
    """Fit the baseline on a batch frame (the training set): global
    [min, max] plus fixed-width bin counts. Two tiny collects (a 1-row
    bounds agg and a <= ``bins``-row count agg) — the same train-time
    driver-side materialization as the reference's threshold fit."""
    lo, hi = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).first()
    if lo is None or hi is None:
        raise ValueError(
            f"histogram_baseline: no non-null '{value_col}' values in the "
            "training frame — a baseline needs at least one observation"
        )
    lo, hi = float(lo), float(hi)
    bin_col = _bin_expr(F.col(value_col), lo, hi, bins)
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_bin = {r["bin"]: r["c"] for r in rows}
    return HistogramBaseline(
        v_lo=lo, v_hi=hi, counts=tuple(by_bin.get(b, 0) for b in range(bins))
    )


def _bin_expr(v, lo: float, hi: float, bins: int):
    """Closed-form bin id, clamped BOTH ways: a live stream can see
    values outside the training range (the batch PSI query cannot, its
    bounds are the data's own min/max)."""
    if hi <= lo:
        return F.lit(0)
    return F.greatest(
        F.lit(0),
        F.least(
            F.lit(bins - 1),
            F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(bins))).cast(
                "int"
            ),
        ),
    )


def psi_drift_monitor(
    stream: DataFrame,
    baseline: HistogramBaseline,
    value_col: str,
    ts_col: str,
    window: str = "1 minute",
    alarm_bits: float = 0.2,
    watermark: str | None = None,
) -> DataFrame:
    """Score each event-time window of ``stream`` with add-one-smoothed
    base-2 PSI against ``baseline``.

    Output per window: ``window_start, window_end, n, psi_bits, alarm``.
    The PSI arithmetic mirrors the batch ``value_drift_psi`` query
    exactly (same smoothing, same fixed-point logs, same left-to-right
    term order), with every baseline-side quantity — including its
    fp_log2 values — folded into the plan as Python-computed literals.
    """
    b_ = baseline.bins
    m_tot = baseline.total + b_
    l_mb = fp_log2_py(m_tot)
    if watermark:
        stream = stream.withWatermark(ts_col, watermark)
    binned = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(ts_col).alias("__ts"),
        _bin_expr(F.col(value_col), baseline.v_lo, baseline.v_hi, b_).alias(
            "__bin"
        ),
    )
    counts = binned.groupBy(F.window("__ts", window).alias("w")).agg(
        *[
            F.count_if(F.col("__bin") == b).alias(f"c{b}")
            for b in range(b_)
        ]
    )
    n = reduce(
        lambda acc, b: acc + F.col(f"c{b}"), range(1, b_), F.col("c0")
    )
    hoisted = counts.select(
        "w",
        n.alias("n"),
        (n + b_).cast("long").alias("nb"),
        *[(F.col(f"c{b}") + 1).cast("long").alias(f"c{b}p") for b in range(b_)],
    )
    with_logs = hoisted.select(
        "w",
        "n",
        "nb",
        fp_log2("nb").alias("lnb"),
        *[F.col(f"c{b}p") for b in range(b_)],
        *[fp_log2(f"c{b}p").alias(f"l{b}") for b in range(b_)],
    )

    def term(b: int):
        m_b = baseline.counts[b] + 1
        lr = (F.col(f"l{b}") - F.col("lnb")) - F.lit(
            fp_log2_py(m_b) - l_mb
        )
        d = F.col(f"c{b}p").cast("double") * F.lit(float(m_tot)) - F.lit(
            float(m_b)
        ) * F.col("nb").cast("double")
        return d * lr.cast("double")

    psi_num = reduce(lambda acc, b: acc + term(b), range(1, b_), term(0))
    psi = psi_num / (
        F.lit(256.0) * F.col("nb").cast("double") * F.lit(float(m_tot))
    )
    return with_logs.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
        psi.alias("psi_bits"),
        (psi > F.lit(alarm_bits)).alias("alarm"),
    )


def psi_py(
    window_counts: list[int], baseline: HistogramBaseline
) -> float:
    """Pure-Python twin of the monitor's per-window arithmetic (tests):
    identical smoothing, fixed-point logs, and term order."""
    b_ = baseline.bins
    m_tot = baseline.total + b_
    l_mb = fp_log2_py(m_tot)
    nb = sum(window_counts) + b_
    lnb = fp_log2_py(nb)
    num = 0.0
    for b in range(b_):
        cbp = window_counts[b] + 1
        m_b = baseline.counts[b] + 1
        lr = (fp_log2_py(cbp) - lnb) - (fp_log2_py(m_b) - l_mb)
        d = float(cbp) * float(m_tot) - float(m_b) * float(nb)
        num = num + d * float(lr)
    return num / (256.0 * float(nb) * float(m_tot))


__all__ = [
    "HistogramBaseline",
    "histogram_baseline",
    "psi_drift_monitor",
    "psi_py",
]
