"""Incrementally-maintained aggregate view: a streaming micro-batch feed
kept merged into a queryable parquet table — the pattern behind
"materialized view over a stream" when the sink is a plain columnar store
(no Delta/Iceberg in this environment).

Semantics: the view holds one row per group with additive aggregate state
(count + sum). Each micro-batch's partial aggregates MERGE into the
current view (read current version -> union -> re-aggregate -> publish new
version). Additive state makes the merge exact regardless of how rows
split across batches.

Concurrency (MVCC): each merge writes a NEW ``data-epoch-N`` directory and
flips the ``epoch.json`` pointer; readers resolve the pointer at plan time
and keep reading their version's files, which stay on disk until
``retain_versions`` newer versions exist — an in-flight reader never sees
its files deleted mid-scan (the failure mode of swap-in-place). This is
the snapshot-isolation trick table formats implement, reduced to a pointer
file + retention window.

Exactly-once: foreachBatch is at-least-once; replaying an epoch <= the
pointer is a no-op, upgrading this sink to exactly-once.

Scale shape: merge cost is O(|view| + |batch partials|) per trigger —
independent of stream history — and both sides are aggregates, not raw
events. At cluster scale the same loop writes partitioned parquet and
merges only the partitions the batch touched.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AggregateView:
    """count+sum per key-tuple, maintained across micro-batches."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
        retain_versions: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = keys
        self.value_col = value_col
        self.retain_versions = max(1, retain_versions)
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ---------------------------------------------
    @property
    def _meta_file(self) -> str:
        return os.path.join(self.path, "epoch.json")

    def _version_dir(self, epoch: int) -> str:
        return os.path.join(self.path, f"data-epoch-{epoch}")

    def last_epoch(self) -> int:
        try:
            with open(self._meta_file) as f:
                return int(json.load(f)["epoch"])
        except (OSError, ValueError, KeyError):
            return -1

    # -- read ------------------------------------------------------------
    def current(self) -> DataFrame:
        """The view at the current version (empty before the first merge).

        The version is resolved NOW; the returned frame keeps reading that
        version's files even while newer merges land (snapshot isolation
        within the retention window).
        """
        epoch = self.last_epoch()
        if epoch >= 0:
            return self.spark.read.parquet(self._version_dir(epoch))
        schema = ", ".join(f"`{k}` string" for k in self.keys)
        return self.spark.createDataFrame(
            [], f"{schema}, n long, total double"
        )

    # -- write -----------------------------------------------------------
    def _partials(self, batch: DataFrame) -> DataFrame:
        return batch.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(self.value_col).cast("double").alias("total"),
        )

    def merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook: merge one micro-batch into the view.

        Idempotent per epoch: replays of an already-applied epoch no-op.
        """
        prev = self.last_epoch()
        if epoch_id <= prev:
            return
        merged = (
            self.current()
            .unionByName(self._partials(batch))
            .groupBy(*self.keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
            )
        )
        new_dir = self._version_dir(epoch_id)
        merged.write.mode("overwrite").parquet(new_dir)
        # flip the pointer atomically (write-then-rename)
        tmp_meta = self._meta_file + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump({"epoch": epoch_id}, f)
        os.rename(tmp_meta, self._meta_file)
        # retention: drop versions older than the newest `retain_versions`
        versions = sorted(
            int(d.rsplit("-", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("data-epoch-")
        )
        for old in versions[: -self.retain_versions]:
            shutil.rmtree(self._version_dir(old), ignore_errors=True)

    def sink(self):
        """(DataFrame, epoch_id) callable for writeStream.foreachBatch."""
        return self.merge_batch
