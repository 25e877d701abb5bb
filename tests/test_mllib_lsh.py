"""MLlib LSH path: recall against the exact brute-force baseline."""

import pytest

from doeecommerce_datapipeline_spark.operators.mllib_lsh import (
    HAVE_ML,
    mllib_approx_neighbors,
    mllib_similarity_join,
)

pytestmark = pytest.mark.skipif(not HAVE_ML, reason="pyspark.ml unavailable")


def test_similarity_join_finds_close_pairs(spark, sf_dir):
    pairs = mllib_similarity_join(spark, sf_dir, threshold=1.2).collect()
    assert all(r["dist"] <= 1.2 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_approx_neighbors_overlap_exact_topk(spark, sf_dir):
    import __spark_entry__ as m

    exact = [r["vec_id"] for r in m.queries()["embedding_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in mllib_approx_neighbors(spark, sf_dir, 0, 10).collect()]
    # LSH recall won't be perfect; require non-trivial overlap with the
    # exact cosine top-10 (euclidean vs cosine also differ slightly)
    assert len(set(exact) & set(approx)) >= 3
