"""Connected components / canonical dedup groups (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.operators.graph import (
    connected_components,
    dedup_canonical,
)


def test_components_chain_clique_isolated(spark):
    # chain 1-2-3-4 (transitivity the pair view can't see), clique {10,11,12},
    # pair {20,21}; node 30 isolated (absent from edges entirely)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.comp for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_canonical_keeps_one_per_component(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    all_ids = spark.range(1, 13).select(F.col("id").alias("doc_id"))
    out = dedup_canonical(pairs, all_ids)
    rows = {r.doc_id: (r.canonical_id, r.is_kept) for r in out.collect()}
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (1, False)
    assert rows[10] == (10, True)
    assert rows[11] == (10, False)
    # edge-free docs are their own canonical and survive
    for i in (4, 5, 6, 7, 8, 9, 12):
        assert rows[i] == (i, True)
    kept = [d for d, (_, k) in rows.items() if k]
    assert len(kept) == len(set(r[0] for r in rows.values()))


def test_components_raises_without_convergence(spark):
    # a 6-chain needs ~5 rounds; max_iter=1 must fail loudly, not silently
    # return a half-propagated labeling
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, max_iter=1)
