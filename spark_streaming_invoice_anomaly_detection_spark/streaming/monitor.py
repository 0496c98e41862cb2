"""S9: per-batch streaming diagnostics (reference InvoicePipeline.scala:314-316).

The reference printlns each micro-batch's record count from ``foreachRDD``.
Structured Streaming surfaces the same numbers (and more: state rows,
durations, per-source offsets) through StreamingQueryListener progress
events — observability without adding a count() action to the hot path,
which is the behavior that matters when a batch is 10^9 rows.
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger(__name__)


class BatchCountListener(StreamingQueryListener):
    """Logs per-batch input-row counts; keeps a bounded in-memory history.

    Register with ``spark.streams.addListener(listener)``; the history
    (list of dicts with query id/name, batchId, numInputRows,
    batchDuration) backs tests and ad-hoc inspection the way the
    reference's console output did.
    """

    def __init__(self, history_limit: int = 1000) -> None:
        self.history: list[dict] = []
        self._limit = history_limit

    def onQueryStarted(self, event) -> None:
        logger.info("query started: id=%s name=%s", event.id, event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        entry = {
            "id": str(p.id),
            "name": p.name,
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "batchDuration": p.batchDuration,
        }
        self.history.append(entry)
        if len(self.history) > self._limit:
            del self.history[: -self._limit]
        # the reference's "Total purchases in batch: N" line (:314-316)
        logger.info(
            "batch %d of %s: %d input rows in %d ms",
            p.batchId,
            p.name or p.id,
            p.numInputRows,
            p.batchDuration,
        )

    def onQueryIdle(self, event) -> None:  # Spark >= 3.5 callback
        logger.debug("query idle: id=%s", event.id)

    def onQueryTerminated(self, event) -> None:
        logger.info(
            "query terminated: id=%s exception=%s", event.id, event.exception
        )


def observed(df, name: str, *metrics):
    """Attach inline metrics to a DataFrame (``Observation`` API): the
    metrics compute DURING the job from the rows that actually flow —
    zero extra scan, unlike a separate count()/agg job. Returns
    (instrumented_df, observation); read ``observation.get`` after an
    action. The per-query diagnostics surface for batch jobs, matching
    BatchCountListener on the streaming side.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
