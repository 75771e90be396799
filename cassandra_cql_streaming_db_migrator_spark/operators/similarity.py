"""Similarity search over embedding columns (SURVEY §7.2.6).

Embeddings are ``array<float>`` columns.  Two paths:

  * ``cosine_topk`` — brute-force exact scan: the baseline, and the
    correctness oracle for the ANN path.  All arithmetic is a sequential
    double-precision fold (F.aggregate), so results are bit-reproducible
    across engines — JVM-side, codegen'd, no UDF.
  * ``lsh_ann_topk`` — the scale path: deterministic random-hyperplane LSH.
    Each vector gets a B-bit bucket id (sign of dot(plane_b, v)); search
    touches only the query's bucket.  At 100 TB the bucketing is a narrow
    map + one partition-pruned read when bucket ids are a partition column;
    brute force stays O(n) per query.

Hyperplanes are pseudo-random but frozen: component i of plane b is derived
from an LCG on (b, i), so engine and tests agree without storing planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (deterministic:
    same operand order -> same bits on any engine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single query vector (one-row DF).
    Broadcast the query; TakeOrderedAndProject keeps the scan single-pass.
    Ties broken by id for determinism."""
    q = F.broadcast(query.select(F.col(vec_col).alias("__query_vec")))
    scored = embeddings.crossJoin(q).select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__query_vec")).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


# --- deterministic hyperplane LSH -----------------------------------------

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648


def _plane_component(b: int, i: Column) -> Column:
    """Frozen pseudo-random weight in [-1, 1): ((A*(b*4096+i)+C) mod M) / M*2 - 1."""
    seed = (F.lit(_LCG_A) * (F.lit(b * 4096) + i) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    return seed.cast("double") / F.lit(float(_LCG_M)) * 2.0 - 1.0


def bucket_id(vec: Column, n_bits: int = 8) -> Column:
    """B-bit LSH bucket: bit b = sign of dot(plane_b, vec)."""
    def weigh(b: int):
        return lambda x, i: x.cast("double") * _plane_component(b, i)

    out = F.lit(0).cast("long")
    for b in range(n_bits):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), weigh(b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def lsh_ann_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    Recall is tunable via n_bits (fewer bits -> bigger buckets -> higher
    recall, more compute)."""
    bucketed = embeddings.withColumn("__bucket", bucket_id(F.col(vec_col), n_bits))
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("__query_vec"),
            bucket_id(F.col(vec_col), n_bits).alias("__qbucket"),
        )
    )
    candidates = bucketed.join(q, bucketed["__bucket"] == q["__qbucket"])
    scored = candidates.select(
        F.col(id_col), cosine(F.col(vec_col), F.col("__query_vec")).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def cosine_pairs(
    embeddings: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs within blocks (exact within-block):
    pairs sharing ``block_col`` with cosine >= threshold.  Blocking bounds
    the pair count; at scale the block column is an LSH bucket."""
    a = embeddings.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("id_1"), F.col(vec_col).alias("v1")
    )
    b = embeddings.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("id_2"), F.col(vec_col).alias("v2")
    )
    joined = a.join(b, on="__blk").filter(F.col("id_1") < F.col("id_2"))
    scored = joined.select(
        F.col("id_1").alias(f"{id_col}_1"),
        F.col("id_2").alias(f"{id_col}_2"),
        cosine(F.col("v1"), F.col("v2")).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= F.lit(threshold))
