"""MLlib-backed similarity join — the library path for LSH
(SURVEY.md §2.3 planned-extension note: `ml.feature.
BucketedRandomProjectionLSH.approxSimilarityJoin`).

Complements the hand-rolled LSH in similarity.py/dedup.py: MLlib keeps
the model (hyperplane matrix) as a fitted transformer you can persist
and reuse across jobs — the right shape when the ANN index outlives a
single query. The hand-rolled variant stays preferable when you need
engine-exact control over hashing (oracle parity, cross-engine reuse).

rows-only correctness (random model vectors are seeded but
implementation-specific); recall is unit-tested against the exact
brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    HAVE_ML = True
except Exception:  # pragma: no cover
    HAVE_ML = False


def mllib_similarity_join(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 1.0,
    bucket_length: float = 0.5,
) -> DataFrame:
    """Approximate self-join of embeddings within euclidean distance
    `threshold`, via bucketed random projections.

    Plan shape mirrors the hand-rolled LSH: hash to buckets → bucket-
    local join → exact distance filter. Returns (id_a, id_b, dist).
    """
    if not HAVE_ML:
        raise ImportError("pyspark.ml unavailable")
    # r10 (guide §2.1): the vectorized frame feeds THREE consumers —
    # the fit scan and both sides of the approx self-join — so it
    # materializes once; rows unchanged (the model is seeded and
    # data-determined, the checkpoint only truncates lineage)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    ).localCheckpoint(eager=True)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(e)
    joined = model.approxSimilarityJoin(e, e, threshold, distCol="dist")
    return (
        joined.select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.col("dist"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )


def mllib_approx_neighbors(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """approxNearestNeighbors for one query vector — the point-lookup
    companion to the self-join."""
    if not HAVE_ML:
        raise ImportError("pyspark.ml unavailable")
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(e)
    key = e.where(F.col("vec_id") == query_vec_id).head()
    if key is None:
        return spark.createDataFrame([], "vec_id long, distCol double")
    return model.approxNearestNeighbors(
        e.where(F.col("vec_id") != query_vec_id), key["features"], k
    ).select("vec_id", "distCol")
