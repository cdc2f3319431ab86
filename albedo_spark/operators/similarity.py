"""Similarity search over embedding columns (``array<float>``).

North-star extension (BASELINE.json): approximate-nearest-neighbor as a
reusable operator. Two tiers:

- ``cosine_knn``: brute-force top-k — broadcast the (small) query set against
  the corpus, dot/norm as native higher-order expressions, per-query top-k
  via the W1 window idiom. Exact; linear in |corpus|×|queries|; the baseline
  and the verifier.
- ``random_hyperplane_lsh_knn``: sign-bit bucketing on r seeded random
  hyperplanes (Charikar SimHash-for-cosine). Bucket equi-join replaces the
  cross product; multi-probe (flip one bit) trades recall for cost. At
  100 TB, this is the path: the corpus is hashed once (narrow), buckets are
  value-balanced, and the join shuffles only on (table, bucket).

Precompute norms once per side rather than per pair.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from albedo_spark.functions.vectors import dot, l2_norm
from albedo_spark.operators.topk import top_k_per_group


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, l2_norm(F.col(vec_col)))


def cosine_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast(queries) × corpus → cosine via precomputed norms →
    row_number window per query (ties broken by neighbor id). Output
    (query_id, neighbor_id, cosine, rank).
    """
    c = _with_norm(corpus, vec_col, "_cn").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_cn"
    )
    q = _with_norm(queries, vec_col, "_qn").select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"), "_qn"
    )
    scored = (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("_cn") > 0) & (F.col("_qn") > 0),
                dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn")),
            ).otherwise(F.lit(0.0)),
        )
        .select(query_id_col, "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank=True,
    )


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """The seeded random hyperplanes — exposed so oracles (DuckDB SQL) can
    embed the identical literals."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_signature(
    vec_col: Column, dim: int, num_planes: int = 16, seed: int = 42
) -> Column:
    """Bit-signature bucket id from r seeded random hyperplanes.

    Hyperplanes are generated driver-side with a seeded RNG and folded into
    the expression as literals — identical across runs and engines.
    """
    planes = hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def random_hyperplane_lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: compare only vectors whose hyperplane signatures
    match (optionally within Hamming distance 1 via query-side probes).

    The corpus is hashed once; queries explode to 1+num_planes probe buckets;
    the candidate join is a plain equi-join on bucket.
    """
    c = _with_norm(corpus, vec_col, "_cn").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        "_cn",
        hyperplane_signature(F.col(vec_col), dim, num_planes, seed).alias("bucket"),
    )
    q = _with_norm(queries, vec_col, "_qn").withColumn(
        "_sig", hyperplane_signature(F.col(vec_col), dim, num_planes, seed)
    )
    if multi_probe:
        probes = F.array(
            F.col("_sig"),
            *[F.col("_sig").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)],
        )
    else:
        probes = F.array(F.col("_sig"))
    q = q.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        "_qn",
        F.explode(probes).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("_cn") > 0) & (F.col("_qn") > 0),
                dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn")),
            ).otherwise(F.lit(0.0)),
        )
        .select(query_id_col, "neighbor_id", "cosine")
        .distinct()
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank=True,
    )
