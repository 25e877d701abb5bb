"""Distributed PCA over the embeddings table — the dimensionality-
reduction stage a training-data pipeline runs before clustering /
visualization / cheap-ANN, via MLlib's PCA estimator (covariance is
accumulated distributed in one pass; the eigendecomposition runs on
the driver over the tiny d×d matrix — d = 64 here, so the driver-side
cost is microseconds at ANY row scale; at d in the thousands switch
to randomized SVD over RowMatrix).

rows-only correctness (eigenvector sign/rotation is
implementation-specific, so no cross-engine oracle exists); the units
pin the properties that ARE contractual: components capture
monotonically non-increasing variance, projections of distinct
vectors are distinct, and reconstruction from all d components is
lossless to float precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

try:
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    HAVE_ML = True
except Exception:  # pragma: no cover
    HAVE_ML = False


def pca_project(
    df: DataFrame, vec_col: str, k: int, out_col: str = "pc"
) -> DataFrame:
    """Fit PCA on `vec_col` (array<float/double>) and append the
    k-dim projection as array<double> `out_col`. The fitted model is
    a d×k broadcast matrix — the transform is a map-side matmul, no
    shuffle beyond the covariance aggregate inside fit()."""
    if not HAVE_ML:
        raise ImportError("pyspark.ml unavailable")
    withvec = df.withColumn("_v", array_to_vector(F.col(vec_col)))
    model = MLPCA(k=k, inputCol="_v", outputCol="_pc").fit(withvec)
    return (
        model.transform(withvec)
        .withColumn(out_col, vector_to_array(F.col("_pc")))
        .drop("_v", "_pc")
    )


def pca_embeddings_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full face: project the 64-dim embeddings onto their top 8
    principal components, every coordinate unpacked to a scalar
    column — (vec_id, label, pc1..pc8). Non-registry since r8: the
    eigenbasis has sign/rotation ambiguity, so no cross-engine oracle
    exists for the raw scores — the registry serves the oracle-paired
    contract face pca_embeddings below.

    The face emits SCALARS ONLY: the driver canonicalizes (pandas
    sort + value hash) every entry's output, rows-only included, and
    a raw array<double> column crashes that step (round 4's one red
    row). The array-valued projection stays available via
    pca_project() for the variance/isometry units;
    tests/test_parity.py::test_rows_only_driver_hashable now guards
    the whole rows-only family against this class."""
    e = table(spark, sf_dir, "embeddings")
    out = pca_project(e, "embedding", k=8)
    return out.select(
        "vec_id",
        "label",
        *[F.col("pc")[i].alias(f"pc{i + 1}") for i in range(8)],
    )


PCA_K = 8
# orthonormality tolerance: LAPACK eigenvectors of the symmetric
# covariance are orthonormal to ~1e-15; 1e-9 leaves 6 orders of margin
# while any indexing/transposition bug lands at O(0.1)
PCA_ORTHO_TOL = 1e-9


def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry contract face (r8 tightening, the
    quality_classifier/recall-scoreboard pattern — rows-only ->
    oracle-paired): per principal component, the exact halves
    (component index, input row count, input dim — all derivable by
    the DuckDB twin from the embeddings table alone) plus the two
    contract booleans the module docstring has always named, pinned
    TRUE: explained variance is non-increasing down the component
    list, and the component vectors are pairwise orthonormal within
    PCA_ORTHO_TOL. The fitted d x k basis and explained-variance
    vector are driver-side tiny (d = 64) at ANY row scale — the
    distributed work is the one-pass covariance accumulation inside
    fit(), identical to the full face's. Raw per-doc projections live
    on as pca_embeddings_full (non-registry)."""
    import numpy as np

    if not HAVE_ML:
        raise ImportError("pyspark.ml unavailable")
    e = table(spark, sf_dir, "embeddings")
    withvec = e.withColumn("_v", array_to_vector(F.col("embedding")))
    model = MLPCA(k=PCA_K, inputCol="_v", outputCol="_pc").fit(withvec)
    n_rows = e.count()
    q = model.pc.toArray()  # d x k
    dim = q.shape[0]
    ev = list(model.explainedVariance)
    gram = q.T @ q
    rows = []
    for c in range(PCA_K):
        var_noninc = bool(ev[c] >= ev[c + 1]) if c + 1 < PCA_K else True
        ortho = bool(
            max(
                abs(gram[c, j] - (1.0 if j == c else 0.0))
                for j in range(PCA_K)
            )
            <= PCA_ORTHO_TOL
        )
        rows.append((c + 1, n_rows, int(dim), var_noninc, ortho))
    return spark.createDataFrame(
        rows,
        "component long, n_rows bigint, dim int, "
        "var_nonincreasing boolean, orthonormal_ok boolean",
    ).orderBy("component")
