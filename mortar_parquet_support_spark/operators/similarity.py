"""Similarity search over embedding columns (array<float>).

Driver north-star extension (BASELINE.json:6). Two tiers:

- ``cosine_topk``  brute-force exact top-k: broadcast the (small) query set
  against the corpus — one corpus scan, no shuffle except the final top-k
  window. The 100 TB shape: queries are O(1..10^4) rows, the corpus is the
  big side and is never shuffled or materialized.
- ``lsh_topk``     approximate: random-hyperplane signatures bucket the
  corpus once (reusable, persistable); queries probe only their bucket
  (plus optional multi-probe neighbors), then exact-rerank inside buckets.

All vector math is JVM-side (``zip_with`` + left-fold ``aggregate`` — the
deterministic summation order makes scores reproducible bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mortar_parquet_support_spark.functions import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id (deterministic across engines/runs).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_signature(
    vec: Column, *, n_planes: int = 12, seed: int = 42
) -> Column:
    """Integer LSH bucket from ``n_planes`` pseudo-random hyperplane sign
    bits; hyperplane weights are ±1 derived from xxhash64(dim, plane, seed),
    so the signature is seed-deterministic with zero driver state."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0)
    for p in range(n_planes):
        signed = F.zip_with(
            vec,
            dim_idx,
            lambda v, i: F.when(
                F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), F.lit(2)) == 1,
                v.cast("double"),
            ).otherwise(-v.cast("double")),
        )
        dot = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact-rerank
    inside it. Recall < 1 by construction (bucket misses); raise recall by
    lowering ``n_planes`` (bigger buckets) or unioning multiple seeds
    (multi-probe). Corpus bucketing is a pure projection — persist the
    bucketed corpus once and amortize across query batches."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), n_planes=n_planes, seed=seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), n_planes=n_planes, seed=seed).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
