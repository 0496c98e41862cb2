"""Similarity search over embedding columns (SURVEY.md §7 Phase 4).

Two tiers:

- brute-force cosine top-k: exact baseline — one scan, native array
  arithmetic, TakeOrdered for the k cut (no full sort)
- random-hyperplane LSH: signs against h60-seeded hyperplanes bucket the
  vectors; queries probe only their own bucket (plus optional multi-probe).
  The scale path: bucket join instead of scan-everything.

The hyperplanes derive from the same md5/h60 primitive as the dedup
operators — deterministic, seedable, and reproducible by the DuckDB oracle
(no driver-side RNG state to ship).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine
from .text import h60


def cosine_to_query(vec_col: Column | str, query: list[float]) -> Column:
    """Cosine between each row's vector and a fixed query vector literal."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.array(*[F.lit(float(x)) for x in query])
    return cosine(c, q)


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    its k best, the driver merges — O(n) scan, no shuffle of the full set.
    Ties break on id for determinism.
    """
    return (
        df.select(
            F.col(id_col), cosine_to_query(vec_col, query).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    h60('rp:<plane>:<dim>') scaled — reproducible in SQL, no RNG state."""
    return (
        h60(F.lit(f"rp:{plane}:{dim}")).cast("double") / F.lit(float(1 << 59))
    ) - F.lit(1.0)


def rp_lsh_signature(
    vec_col: Column | str, num_planes: int, dim: int
) -> Column:
    """Random-projection sign signature packed into an int (bit p = sign of
    dot(vec, plane_p))."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vd = F.transform(v, lambda x: x.cast("double"))
    sig = None
    for p in range(num_planes):
        plane = F.array(*[_hyperplane_component(p, d) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(vd, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        term = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("int")


def lsh_bucket_vectors(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its RP-LSH bucket: (id, bucket, vector)."""
    return df.select(
        F.col(id_col),
        rp_lsh_signature(vec_col, num_planes, dim).alias("bucket"),
        F.col(vec_col),
    )


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: rank by cosine only within the query's bucket.

    With 2^num_planes buckets the probed fraction is ~1/2^p of the corpus;
    recall comes from bucket collision probability (1 - theta/pi per plane).
    Multi-probe (flipping low-margin bits) is the standard recall lever —
    here the single-bucket probe is the honest baseline.
    """
    bucketed = lsh_bucket_vectors(df, num_planes, dim, vec_col, id_col)
    qsig_row = (
        df.sparkSession.range(1)
        .select(
            rp_lsh_signature(
                F.array(*[F.lit(float(x)) for x in query]), num_planes, dim
            ).alias("b")
        )
        .first()
    )
    return (
        bucketed.filter(F.col("bucket") == int(qsig_row["b"]))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
