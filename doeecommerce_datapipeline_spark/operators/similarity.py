"""Similarity search over array<float> embeddings (north star).

Two tiers:
- brute-force cosine top-k: one scan, per-row fold arithmetic, top-k
  via TakeOrderedAndProject — the exact baseline and the oracle query.
- LSH-bucketed ANN: random-hyperplane signatures bucket the vectors;
  search touches only the query's bucket (and optionally neighboring
  probes). At 100 TB the bucketed table is the pre-computed index —
  written partitioned by bucket so a probe is partition pruning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, norm
from ..io import table

N_PLANES = 12  # 4096 buckets


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id=0 over all embeddings.

    The query vector rides along as a broadcast single-row join — no
    collect at plan time, so the same plan works when the "query set"
    is a table of thousands of vectors.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        e.join(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine("embedding", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (pure function of
    (plane, i) — no RNG state, reproducible everywhere)."""
    vals = [
        math.sin(plane * 1_000_003 + i * 7_919 + 0.5) for i in range(dim)
    ]
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def lsh_bucket(df: DataFrame, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit string over N_PLANES
    fixed hyperplanes. Pure column arithmetic; the planes are literals
    baked into the plan (broadcast-free)."""
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        plane = _hyperplane(dim, p)
        proj = F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(
                proj > 0, F.shiftleft(F.lit(1).cast("long"), p)
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn("bucket", bucket)


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for vec_id=0: exact cosine, but only within the
    query's LSH bucket — the candidate set is |bucket| ≈ n/4096.
    rows-only check (recall vs the exact baseline is unit-tested)."""
    e = lsh_bucket(table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        e.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine("embedding", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-op profile of the embedding column: dimension, L2 norm,
    element mean — the sanity scan before any ANN build."""
    e = table(spark, sf_dir, "embeddings")
    s = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        norm("embedding").alias("l2_norm"),
        (s / F.size("embedding")).alias("elem_mean"),
    )
