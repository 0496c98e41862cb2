"""Persistent IVF index: probe == on-the-fly operator, pruning is real."""

from __future__ import annotations

import pytest

from spark_streaming_invoice_anomaly_detection_spark.operators.ann_index import (
    append_ann_index,
    build_ann_index,
    probe_ann_index,
)
from spark_streaming_invoice_anomaly_detection_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from spark_streaming_invoice_anomaly_detection_spark.sources.catalog import (
        load_table,
    )

    return load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def query(emb):
    row = emb.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def idx(emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "idx")
    build_ann_index(emb, path)
    return path


def test_probe_equals_on_the_fly_ivf(spark, emb, query, idx):
    got = probe_ann_index(spark, idx, query, k=10, n_probe=2).collect()
    want = ivf_topk(emb, query, k=10, n_probe=2).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in want
    ]
    assert len(got) == 10


def test_full_probe_equals_brute_force(spark, emb, query, idx):
    got = probe_ann_index(spark, idx, query, k=10, n_probe=8).collect()
    want = brute_force_topk(emb, query, k=10).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]


def test_probe_scan_is_partition_pruned(spark, query, idx):
    """The cell filter must resolve ENTIRELY to partition pruning: the
    FileScan carries a non-empty PartitionFilters on cell and no residual
    DataFilters — the probe reads only its n_probe directories."""
    df = probe_ann_index(spark, idx, query, k=10, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [cell" in scan
    assert " IN (" in scan
    assert "DataFilters: []" in scan


def test_append_lands_in_probe_results(spark, emb, query, tmp_path):
    import pyspark.sql.functions as F

    path = str(tmp_path / "idx2")
    build_ann_index(emb, path)
    # a verbatim copy of the query vector with a fresh id must become the
    # top hit (cos = 1) after append
    twin = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    append_ann_index(twin, path)
    top = probe_ann_index(spark, path, query, k=2, n_probe=1).collect()
    ids = {r.vec_id for r in top}
    assert any(i >= 5_000_000 for i in ids)
