"""Hot model reload for the serving pipeline.

The reference splits operation into an offline trainer
(start_training.sh -> Clustering.scala saves model + threshold) and a
serving pipeline (start_pipeline.sh -> InvoicePipeline.scala:125-133 loads
both ONCE at startup) — picking up a retrained model requires restarting
the stream and re-reading Kafka offsets. This module removes the restart:
a ``ReloadableDetector`` wraps the model directory and re-loads whenever
the trainer publishes a new version, checked once per micro-batch from the
driver (a metadata stat, not a data-plane cost).

Versioning contract: the trainer writes the model with
``publish_detector`` — save to a temp dir, then an atomic rename onto the
live path plus a monotonically increasing ``version`` field in
``detector.json``. Readers only reload when the version CHANGES, so a
half-written directory is never observed (rename is atomic on the same
filesystem; on object stores, write-new-prefix + pointer-file gives the
same property).

At scale this is exactly the Spark pattern for refreshing broadcast
state: the reload happens on the driver between micro-batches, and the
scoring plan built from the fresh model re-broadcasts its (tiny) centroid
matrix with the next batch's job — executors never mutate shared state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..ml.clustering import Detector, load_detector, save_detector


def publish_detector(detector: Detector, path: str, version: int) -> None:
    """Trainer-side publish: save, then stamp the version LAST so a reader
    that sees the new version is guaranteed to see the finished model."""
    save_detector(detector, path)
    meta_path = os.path.join(path, "detector.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["version"] = int(version)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)  # atomic on POSIX


def read_version(path: str) -> int | None:
    """The published version, or None while no model exists yet."""
    try:
        with open(os.path.join(path, "detector.json")) as f:
            return int(json.load(f).get("version", 0))
    except (FileNotFoundError, json.JSONDecodeError):
        return None


class ReloadableDetector:
    """Serving-side handle: ``current(spark)`` returns the latest published
    Detector, reloading only when the version sidecar changed.

    Call it at the top of each ``foreachBatch`` body: the common case is
    one small JSON stat per micro-batch; the rare case (new version) is
    one model load on the driver. The returned Detector is a plain value —
    scoring plans built from it broadcast its centroids per job, so
    in-flight batches keep the model they started with (no torn reads).
    """

    def __init__(self, path: str):
        self.path = path
        self._version: int | None = None
        self._detector: Detector | None = None

    def current(self, spark: SparkSession) -> Detector:
        ver = read_version(self.path)
        if ver is None:
            raise FileNotFoundError(f"no published detector at {self.path}")
        if ver != self._version:
            self._detector = load_detector(spark, self.path)
            self._version = ver
        assert self._detector is not None
        return self._detector


__all__ = ["ReloadableDetector", "publish_detector", "read_version"]
