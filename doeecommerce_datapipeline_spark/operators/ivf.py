"""IVF (inverted-file) approximate nearest neighbors: k-means coarse
quantizer + cluster-bucketed exact search — the standard ANN scale
path when hyperplane LSH recall plateaus.

Build: fit KMeans on (a sample of) the embeddings; assign every vector
to its nearest centroid (one narrow pass). Persist partitioned by
cluster id — a probe then reads only n_probe partitions (partition
pruning IS the index).

Query: find the n_probe centroids nearest the query vector (tiny,
driver-side — centroids are k×dim floats), then exact cosine over just
those clusters' members.

rows-only correctness (k-means init is seeded but implementation-
specific); recall vs the exact brute force is unit-tested.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..io import table

try:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    HAVE_ML = True
except Exception:  # pragma: no cover
    HAVE_ML = False

N_CLUSTERS = 16
N_PROBE = 4
FIT_SAMPLE = 2048


def build_ivf_index(
    df: DataFrame, n_clusters: int = N_CLUSTERS, seed: int = 42
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (vectors + cluster_id, centroid list)."""
    if not HAVE_ML:
        raise ImportError("pyspark.ml unavailable")
    feat = df.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    # Train the coarse quantizer on a bounded DETERMINISTIC sample
    # (every stride-th vec_id): k-means iterations then cost O(sample)
    # instead of O(table), which is the textbook IVF build — a coarse
    # quantizer's centroids stabilize long before the sample stops
    # being representative (recall@10 unit guards this). The full table
    # is still assigned, but that's ONE narrow pass.
    n = feat.count()
    stride = max(1, n // FIT_SAMPLE)
    # coalesce(1): a ≤2k-vector fit is scheduling-bound on a wide
    # cluster — one task per k-means pass beats 32 near-empty ones.
    # random init skips k-means||'s extra distributed passes; a coarse
    # quantizer only needs roughly-spread centroids.
    fit_on = feat.where(F.pmod("vec_id", F.lit(stride)) == 0).coalesce(1)
    # maxIter=8: probe recall is insensitive to late-stage drift
    model = KMeans(
        k=n_clusters,
        seed=seed,
        maxIter=8,
        initMode="random",
        featuresCol="features",
    ).fit(fit_on)
    assigned = model.transform(feat).withColumnRenamed(
        "prediction", "cluster_id"
    ).drop("features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_clusters(
    query: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: d2(query, centroids[i]))
    return order[:n_probe]


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """ANN top-k for one stored vector: probe the n_probe nearest
    clusters only. The candidate set is ~n_probe/n_clusters of the
    table; on a cluster-partitioned layout the non-probed partitions
    are never read."""
    e = table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(e)
    qrow = e.where(F.col("vec_id") == query_vec_id).select("embedding").head()
    if qrow is None:
        return spark.createDataFrame([], "vec_id long, label int, cos double")
    query = [float(x) for x in qrow["embedding"]]
    probe = _nearest_clusters(query, centroids, n_probe)
    qdf = spark.createDataFrame([(query,)], "qv array<float>")
    return (
        assigned.where(F.col("cluster_id").isin(probe))
        .where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qdf))
        .select("vec_id", "label", cosine("embedding", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_recall_vs_exact(spark: SparkSession, sf_dir: str, k: int = 10) -> float:
    """Measured recall@k of the IVF probe against exact brute force."""
    from .similarity import brute_force_topk

    exact = {r["vec_id"] for r in brute_force_topk(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in ivf_topk(spark, sf_dir, 0, k).collect()}
    return len(exact & approx) / max(len(exact), 1)
