"""Incremental MinHash index: probe/update vs the batch pipeline ground
truth — the equivalence that licenses never re-LSHing the corpus."""

from __future__ import annotations

import pytest

from spark_streaming_invoice_anomaly_detection_spark.operators import dedup as D
from spark_streaming_invoice_anomaly_detection_spark.operators.dedup_index import (
    build_index,
    probe_index,
    update_index,
)


def _corpus(spark, sf_dir, lo, hi, plant_dups=False):
    from spark_streaming_invoice_anomaly_detection_spark.sources.catalog import (
        load_table,
    )

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .filter(f"doc_id >= {lo} AND doc_id < {hi}")
    )
    if plant_dups:
        import pyspark.sql.functions as F

        mutated = docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.substring("text", 21, 1_000_000).alias("text"),
        )
        docs = docs.unionByName(mutated)
    return docs


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    """Index half A; probe half B (which contains near-dups of BOTH its
    own docs and A's docs, via mutated copies crossing the split)."""
    import pyspark.sql.functions as F

    from spark_streaming_invoice_anomaly_detection_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    a = docs.filter(f"doc_id < {mid}")
    # B: the rest, plus mutated copies of docs from BOTH halves so the
    # probe must find index-side and delta-side matches
    mut = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.substring("text", 21, 1_000_000).alias("text"),
    )
    b = docs.filter(f"doc_id >= {mid}").unionByName(mut)
    return a, b, docs.unionByName(mut)


def test_probe_matches_batch_pipeline(spark, sf_dir, tmp_path, split):
    a, b, full = split
    idx = str(tmp_path / "idx")
    build_index(a, idx)
    got = {
        (min(r.id_new, r.id_match), max(r.id_new, r.id_match)): r.jaccard
        for r in probe_index(spark, b, idx).collect()
    }

    batch = D.minhash_near_dups(full)
    b_ids = {r.doc_id for r in b.select("doc_id").collect()}
    want = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.jaccard
        for r in batch.collect()
        if r.id_a in b_ids or r.id_b in b_ids
    }
    assert got == want  # same pairs, bit-identical jaccard
    assert len(got) > 0


def test_probe_labels_sides_correctly(spark, sf_dir, tmp_path, split):
    a, b, _ = split
    idx = str(tmp_path / "idx2")
    build_index(a, idx)
    a_ids = {r.doc_id for r in a.select("doc_id").collect()}
    rows = probe_index(spark, b, idx).collect()
    assert rows
    for r in rows:
        if r.matched_in == "index":
            assert r.id_match in a_ids
        else:
            assert r.matched_in == "delta"
            assert r.id_match not in a_ids


def test_update_then_reprobe_finds_new_members(spark, sf_dir, tmp_path):
    """After absorbing a batch, a later identical batch (new ids) matches
    it through the index path."""
    import pyspark.sql.functions as F

    docs = _corpus(spark, sf_dir, 0, 10**9)
    idx = str(tmp_path / "idx3")
    build_index(docs, idx)

    first = docs.limit(5).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    # verbatim copies: must match their originals via the index
    pairs1 = probe_index(spark, first, idx).filter("matched_in = 'index'")
    n1 = pairs1.count()
    assert n1 >= 5
    update_index(first, idx)

    second = docs.limit(5).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    pairs2 = probe_index(spark, second, idx).filter("matched_in = 'index'")
    matches = {r.id_match for r in pairs2.collect()}
    # now matches both the originals AND the first batch's copies
    assert any(m >= 2_000_000 for m in matches)
    assert pairs2.count() >= 2 * 5


def test_probe_empty_index_dir_delta_only(spark, sf_dir, tmp_path):
    """An index built from an empty corpus still supports probing: no
    index-side pairs, delta-side pairs intact."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "idx4")
    build_index(empty, idx)
    delta = _corpus(spark, sf_dir, 0, 10**9, plant_dups=True)
    rows = probe_index(spark, delta, idx).collect()
    assert rows
    assert all(r.matched_in == "delta" for r in rows)
