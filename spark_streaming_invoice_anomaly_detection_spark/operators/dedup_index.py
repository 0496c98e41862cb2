"""Incremental MinHash-LSH near-dup index: probe new batches, never re-LSH.

The batch pipeline (``dedup.minhash_near_dups``) re-shingles the whole
corpus per run — right for a one-shot census, wrong for production
ingestion at 100 TB, where each day's delta must be checked against
everything already accepted WITHOUT touching it. This module persists the
two relations banded LSH actually needs:

- ``bands/``    — (doc_id, band_id, band_hash) bucket entries
- ``shingles/`` — (doc_id, shingles) for exact-Jaccard verification

and gives the ingestion loop three verbs: ``build_index`` (bootstrap),
``probe_index`` (delta vs index AND delta vs delta candidate pairs,
Jaccard-verified), ``update_index`` (append the delta's entries after
acceptance). Probe cost scales with the DELTA's bucket hit lists, not the
corpus; the stored side is touched only on the joined buckets and the
candidates' shingle rows.

Same hash family as the batch pipeline (seeded h60 MinHash, md5 band
hash), so probe+index results are provably identical to re-running the
batch pipeline on old+new — pinned by the equivalence test in
tests/test_dedup_index.py.

At cluster scale: write ``bands/`` bucketed by band_hash (layout.py's
write_bucketed) so the probe join is shuffle-free on the stored side, and
partition ``shingles/`` by an id range so verification reads prune; both
are storage-layout choices on top of the same relations this module
writes as plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    band_entries,
    jaccard_distinct,
    minhash_signature,
    shingle_docs,
)
from .layout import spread_if_narrow


def _prepare(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int,
    num_hashes: int,
    bands: int,
) -> tuple[DataFrame, DataFrame]:
    """(shingles, band entries) for a document frame. Empty-shingle docs
    (shorter than the ngram) carry no LSH evidence and are excluded from
    BOTH relations — mirroring the batch pipeline's degenerate-bucket
    filter."""
    # token-count prefilter, not a size(shingles)>0 post-filter: the
    # pushed-through post-filter re-evaluated the whole shingle expression
    # in an interpreted Filter (see minhash_near_dups); equivalent by
    # construction (word_ngrams is empty iff tokens < ngram)
    from .text import tokenize

    sh = shingle_docs(
        spread_if_narrow(df).filter(
            F.size(tokenize(F.col(text_col))) >= F.lit(ngram)
        ),
        text_col=text_col,
        id_col=id_col,
        ngram=ngram,
    )
    sigs = sh.select(
        id_col, minhash_signature(F.col("shingles"), num_hashes).alias("signature")
    )
    return sh, band_entries(sigs, num_hashes, bands, id_col=id_col)


def build_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """Bootstrap the index from an initial corpus (overwrites ``path``)."""
    sh, entries = _prepare(df, text_col, id_col, ngram, num_hashes, bands)
    entries.write.mode("overwrite").parquet(os.path.join(path, "bands"))
    sh.write.mode("overwrite").parquet(os.path.join(path, "shingles"))


def probe_index(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs of ``delta`` docs against the index AND inside the
    delta itself: ``(id_new, id_match, jaccard, matched_in)`` with
    matched_in in {'index', 'delta'} and jaccard >= threshold.

    A delta doc with NO output row is novel; the caller typically
    anti-joins on id_new before ``update_index``.

    The delta's shingle subtree feeds the signatures plus both verify
    sides and is recomputed per consumer — pure map work over the DELTA
    (small by definition in this access pattern), so no persist is held
    across calls of a long-running ingestion loop.
    """
    sh_new, entries_new = _prepare(
        delta, text_col, id_col, ngram, num_hashes, bands
    )
    entries_idx = spark.read.parquet(os.path.join(path, "bands"))
    sh_idx = spark.read.parquet(os.path.join(path, "shingles"))

    n = entries_new.alias("n")
    i = entries_idx.alias("i")
    cand_idx = (
        n.join(
            i,
            (F.col("n.band_id") == F.col("i.band_id"))
            & (F.col("n.band_hash") == F.col("i.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("id_new"),
            F.col(f"i.{id_col}").alias("id_match"),
        )
        .distinct()
    )
    m = entries_new.alias("m")
    cand_delta = (
        n.join(
            m,
            (F.col("n.band_id") == F.col("m.band_id"))
            & (F.col("n.band_hash") == F.col("m.band_hash"))
            & (F.col(f"n.{id_col}") < F.col(f"m.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("id_new"),
            F.col(f"m.{id_col}").alias("id_match"),
        )
        .distinct()
    )

    def verify(cand: DataFrame, match_side: DataFrame, label: str) -> DataFrame:
        a = sh_new.select(
            F.col(id_col).alias("id_new"), F.col("shingles").alias("sh_a")
        )
        b = match_side.select(
            F.col(id_col).alias("id_match"), F.col("shingles").alias("sh_b")
        )
        return (
            cand.join(a, "id_new")
            .join(b, "id_match")
            .select(
                "id_new",
                "id_match",
                jaccard_distinct(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
            .withColumn("matched_in", F.lit(label))
        )

    return verify(cand_idx, sh_idx, "index").unionByName(
        verify(cand_delta, sh_new, "delta")
    )


def update_index(
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """Append the delta's entries (idempotence is the caller's contract:
    feed each accepted doc exactly once — the same at-least-once line
    every log-structured index draws)."""
    sh, entries = _prepare(delta, text_col, id_col, ngram, num_hashes, bands)
    entries.write.mode("append").parquet(os.path.join(path, "bands"))
    sh.write.mode("append").parquet(os.path.join(path, "shingles"))


__all__ = ["build_index", "probe_index", "update_index"]
