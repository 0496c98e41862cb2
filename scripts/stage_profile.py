"""Per-stage attribution for the MinHash / SimHash scale-probe curves.

The x10 scale probe (scripts/scale_probe.py) measured ~5x wall growth for
``minhash_lsh_neardups`` and ``simhash_signatures`` at 10x data — sublinear
but the steepest in the dedup family, and the round-6 audit could not say
WHICH stage carries it (shingle/tokenize CPU vs the 8-way md5 signature
folds vs the band join vs the Jaccard verify). This probe times CUMULATIVE
pipeline prefixes at x1 and xN on the same constant-duplicate-density
corpora, so each stage's wall time — and its xN/x1 ratio — falls out by
subtraction:

MinHash (operators/dedup.py:minhash_near_dups, stage = prefix delta):
  shingle   = spread + tokenize + 3-gram + eager persist (the cache the
              later stages read)
  signature = 8 seeded h60 min-folds over the cached shingles
  candidates= signature recompute + band explode + bucket self-join +
              DISTINCT (the only shuffle-heavy stage)
  verify    = two hash joins back to the cached shingles + exact Jaccard

SimHash (operators/dedup.py:simhash_docs):
  tokenize  = spread-free explode_outer + per-token h60
  vote_agg  = 60 conditional integer sums + signature assembly

Usage:
    python scripts/stage_profile.py [--copies 10] [--base /root/testdata/sf0.1]
        [--out /tmp/scale_probe] [--reps 3]

Prints one JSON line:
    {"copies": N, "minhash": {stage: {"x1": s, "xN": s, "ratio": r}}, ...}

The corpora come from scale_probe.build_corpus (constant dup density); the
x1 corpus is built through the same writer so layout effects cancel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_probe import build_corpus  # noqa: E402  (sibling script)


def _timed(fn, reps: int) -> float:
    fn()  # warm-up: codegen + shuffle-file reuse parity with the probe
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def minhash_stages(spark, sf_dir: str, reps: int) -> dict[str, float]:
    """Cumulative-prefix timings of the exact registered pipeline
    (plans/extensions.py q_minhash_lsh parameters)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from spark_streaming_invoice_anomaly_detection_spark.operators import dedup as D
    from spark_streaming_invoice_anomaly_detection_spark.operators.layout import (
        spread_if_narrow,
    )
    from spark_streaming_invoice_anomaly_detection_spark.plans.extensions import (
        _MH_BANDS,
        _MH_K,
        _MH_MAX_BUCKET,
        _MH_NGRAM,
        _MH_THRESHOLD,
        _augmented_docs,
    )

    from spark_streaming_invoice_anomaly_detection_spark.operators.text import (
        tokenize,
    )

    def fresh_shingled():
        # mirrors minhash_near_dups' r7 shape: token-count prefilter (not
        # a size(shingles) post-filter) + hoisted-token shingle projection
        df = spread_if_narrow(_augmented_docs(spark, sf_dir))
        df = df.filter(F.size(tokenize(F.col("text"))) >= F.lit(_MH_NGRAM))
        return D.shingle_docs(df, "text", "doc_id", _MH_NGRAM)

    out: dict[str, float] = {}

    # -- stage 1: shingle + eager persist (what the cache costs to fill)
    def run_shingle():
        sh = fresh_shingled().persist(StorageLevel.MEMORY_AND_DISK)
        sh.count()
        sh.unpersist()

    out["shingle"] = _timed(run_shingle, reps)

    # later prefixes read one persisted shingle frame (as the operator does)
    shingled = fresh_shingled().persist(StorageLevel.MEMORY_AND_DISK)
    shingled.count()

    signed = shingled.select(
        "doc_id",
        D.minhash_signature(F.col("shingles"), _MH_K).alias("signature"),
    )
    out["cum_signature"] = _timed(lambda: _noop(signed), reps)

    pairs = D.lsh_candidate_pairs(
        signed, _MH_K, _MH_BANDS, "doc_id", max_bucket=_MH_MAX_BUCKET
    )
    out["cum_candidates"] = _timed(lambda: _noop(pairs), reps)

    a = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    full = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", D.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= F.lit(_MH_THRESHOLD))
        .select("id_a", "id_b", "jaccard")
    )
    out["cum_full"] = _timed(lambda: _noop(full), reps)
    shingled.unpersist()

    out["signature"] = out["cum_signature"]
    out["candidates"] = out["cum_candidates"] - out["cum_signature"]
    out["verify"] = out["cum_full"] - out["cum_candidates"]
    return out


def simhash_stages(spark, sf_dir: str, reps: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from spark_streaming_invoice_anomaly_detection_spark.operators import dedup as D
    from spark_streaming_invoice_anomaly_detection_spark.operators.text import (
        h60,
        tokenize,
    )
    from spark_streaming_invoice_anomaly_detection_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    out: dict[str, float] = {}

    hashed = docs.select(
        "doc_id", F.explode_outer(tokenize(F.col("text"))).alias("token")
    ).select("doc_id", h60(F.col("token")).alias("h"))
    out["cum_tokenize"] = _timed(lambda: _noop(hashed), reps)

    full = D.simhash_docs(docs)
    out["cum_full"] = _timed(lambda: _noop(full), reps)

    out["tokenize"] = out["cum_tokenize"]
    out["vote_agg"] = out["cum_full"] - out["cum_tokenize"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    dirs = {}
    for n in (1, args.copies):
        d = os.path.join(args.out, f"x{n}")
        # unconditional: build_corpus no-ops on a matching _PROBE_META
        # marker and REBUILDS on a stale one (an isdir guard silently
        # reused corpora built from a different base/copies — r8 ADVICE)
        build_corpus(args.base, d, n)
        dirs[n] = d

    from spark_streaming_invoice_anomaly_detection_spark.session import get_spark

    spark = get_spark(app_name=f"stage-profile-x{args.copies}")

    report: dict[str, dict] = {"copies": args.copies}
    for family, fn in (("minhash", minhash_stages), ("simhash", simhash_stages)):
        small = fn(spark, dirs[1], args.reps)
        big = fn(spark, dirs[args.copies], args.reps)
        report[family] = {
            stage: {
                "x1": round(small[stage], 3),
                f"x{args.copies}": round(big[stage], 3),
                "ratio": round(big[stage] / small[stage], 2)
                if small[stage] > 0
                else -1.0,
            }
            for stage in small
            if not stage.startswith("cum_")
        }
        print(f"{family}: {report[family]}", file=sys.stderr)

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
