"""Persistent IVF ANN index: cell-partitioned vector store, pruned probes.

``similarity.ivf_topk`` assigns cells on the fly — right for a one-shot
query, wasteful for a serving corpus probed thousands of times. This
module materializes the assignment ONCE as parquet **directory-partitioned
by cell**, so every probe's `cell IN (...)` filter becomes partition
pruning: the scan touches only the ``n_probe`` matching directories
(`PartitionFilters` in the plan, zero IO elsewhere) — the vector-database
layout expressed in plain Spark storage primitives.

Probe results are identical to the on-the-fly operator (same centroid
literals, same fold cosine, same deterministic ties), pinned by tests;
with ``n_probe == n_cells`` the probe degrades gracefully to the exact
brute-force ranking.

At 100 TB: cells are the unit of parallel IO (one directory per cell,
many files inside); ``append_ann_index`` lands new vectors into their
cell directories without touching existing data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    cosine_to_query,
    ivf_cell,
    ivf_centroid_values,
    ivf_probe_cells,
)

_DIM = 64


def _assigned(
    df: DataFrame, n_cells: int, dim: int, vec_col: str, id_col: str
) -> DataFrame:
    centroids = ivf_centroid_values(n_cells, dim)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_cell(vec_col, centroids).alias("cell"),
    )


def build_ann_index(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    dim: int = _DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Assign cells and write the store partitioned by cell (overwrite)."""
    _assigned(df, n_cells, dim, vec_col, id_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def append_ann_index(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    dim: int = _DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Append new vectors into their cell directories."""
    _assigned(df, n_cells, dim, vec_col, id_col).write.mode(
        "append"
    ).partitionBy("cell").parquet(path)


def probe_ann_index(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    n_cells: int = 8,
    dim: int = _DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by exact cosine over the query's ``n_probe`` nearest cells,
    reading ONLY those cell directories (partition pruning). The probe
    set is driver-side literal arithmetic — no Spark job before the one
    pruned scan; ties break on the id so top-k is deterministic."""
    centroids = ivf_centroid_values(n_cells, dim)
    probe = ivf_probe_cells(query, centroids, n_probe)
    return (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe))
        .select(
            F.col(id_col), cosine_to_query(vec_col, query).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


__all__ = ["build_ann_index", "append_ann_index", "probe_ann_index"]
