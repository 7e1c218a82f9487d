"""Embedding similarity operators (ANN / near-dup over array<float>).

The reference's only vector math is the C++ OpenCV feature matcher
(OpencvMatch/imgmatch.cpp:23-38 — ORB descriptors + knn match); its
Spark-native analog is cosine top-k over an embedding column. Everything
here is built-in higher-order functions (JVM, codegen) — the dot product
is ``aggregate(zip_with(a, b, *), 0d, +)``; no Python in the scoring path.

Scale design:
- brute force is the *correctness baseline*: queries × corpus cross join,
  broadcast the (small) query side, per-partition top-k then global top-k —
  never a full sort of the scored pairs.
- the scale path is random-hyperplane LSH: bucket by sign-bit sketch, join
  on bucket, score only within buckets (candidates shrink ~2^-bits), same
  exact scorer inside. Multi-probe = multiple sketch tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_spark.textops import hash60


def _to_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector (self-match excluded).

    queries is broadcast (the small side by construction); the big side
    streams once with no shuffle; per-query top-k via window over the
    (query_id-partitioned, thus parallel) scored set.
    Returns (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_col(F.col("_qv"), F.col("_v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_sketch_col(vec: Column, n_bits: int, dim: int, seed: str = "lsh") -> Column:
    """Random-hyperplane sign sketch as an n_bits-bit long. Hyperplane
    coefficients are deterministic ±1 from the shared hash (seed, bit, dim)
    — reproducible anywhere, no stored model."""
    v = _to_double(vec)

    def plane_sign(b: int):
        # closure factory — a default-arg lambda would be parsed by Spark as
        # the two-argument (value, index) transform variant
        return lambda i: (
            hash60(F.concat_ws(":", F.lit(seed), F.lit(str(b)), i.cast("string"))) % 2
        ) * 2 - 1

    bits = []
    for b in range(n_bits):
        signs = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(b))
        proj = F.aggregate(
            F.zip_with(v, signs.cast("array<double>"), lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = F.lit(0).cast("long")
    for c in bits:
        out = out + c
    return out


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then the exact cosine ranker. At 10^9 vectors the bucket join replaces
    the cross join — candidate volume drops by ~2^n_bits."""
    sk = hyperplane_sketch_col(F.col(vec_col), n_bits, dim)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), sk.alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sk.alias("bucket"))
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_col(F.col("_qv"), F.col("_v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
