"""IVF ANN: probe correctness and recall vs brute force."""

import pytest

from doeecommerce_datapipeline_spark.operators.ivf import (
    HAVE_ML,
    ivf_recall_vs_exact,
    ivf_topk,
)

pytestmark = pytest.mark.skipif(not HAVE_ML, reason="pyspark.ml unavailable")


def test_ivf_topk_shape(spark, sf_dir):
    rows = ivf_topk(spark, sf_dir, 0, 10).collect()
    assert len(rows) == 10
    cosines = [r["cos"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_recall(spark, sf_dir):
    # with 16 clusters / 4 probes on random-ish 64-dim data, the top-10
    # neighbors concentrate near the query's cluster — expect decent recall
    assert ivf_recall_vs_exact(spark, sf_dir) >= 0.5
