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


def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face: project the 64-dim embeddings onto their top 8
    principal components, every coordinate unpacked to a scalar
    column — (vec_id, label, pc1..pc8).

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
