"""Hot model reload for the serving pipeline.

The reference splits operation into an offline trainer
(start_training.sh -> Clustering.scala saves model + threshold) and a
serving pipeline (start_pipeline.sh -> InvoicePipeline.scala:125-133 loads
both ONCE at startup) — picking up a retrained model requires restarting
the stream and re-reading Kafka offsets. This module removes the restart:
a ``ReloadableDetector`` wraps the model directory and re-loads whenever
the trainer publishes a new version, checked once per micro-batch from the
driver (a metadata stat, not a data-plane cost).

Versioning contract (write-new-prefix + pointer file, the same MVCC
shape as streaming/materialized.py): ``publish_detector`` saves the full
detector into a fresh ``v{N}/`` subdirectory, then atomically replaces
``current.json`` to point at it. Readers resolve the pointer first, so a
half-written version directory is never observed and a reader mid-load
on ``v{N-1}`` is untouched by the publish of ``v{N}`` (its files are
retained for ``retain_versions`` further publishes). Works identically
on object stores, where directory renames aren't atomic but single-key
puts are.

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


def _version_dir(path: str, version: int) -> str:
    return os.path.join(path, f"v{int(version)}")


def publish_detector(
    detector: Detector, path: str, version: int, retain_versions: int = 2
) -> None:
    """Trainer-side publish: save the COMPLETE detector into ``v{N}/``,
    then flip the ``current.json`` pointer (atomic single-file replace) —
    a reader that sees version N is guaranteed a finished model, and a
    reader still loading version N-1 keeps its intact files.

    Older version dirs beyond ``retain_versions`` behind the new pointer
    are deleted (any reader of those finished long ago)."""
    import shutil

    os.makedirs(path, exist_ok=True)
    save_detector(detector, _version_dir(path, version))
    pointer = os.path.join(path, "current.json")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": int(version)}, f)
    os.replace(tmp, pointer)  # atomic on POSIX; single-key put on S3
    for name in os.listdir(path):
        if name.startswith("v") and name[1:].isdigit():
            if int(name[1:]) <= int(version) - retain_versions:
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def read_version(path: str) -> int | None:
    """The published version, or None while no model exists yet."""
    try:
        with open(os.path.join(path, "current.json")) as f:
            return int(json.load(f)["version"])
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
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
            self._detector = load_detector(spark, _version_dir(self.path, ver))
            self._version = ver
        assert self._detector is not None
        return self._detector


__all__ = ["ReloadableDetector", "publish_detector", "read_version"]
