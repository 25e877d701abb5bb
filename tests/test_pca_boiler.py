"""Units for PCA projection and boilerplate removal."""

import numpy as np
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators import pca as P
from doeecommerce_datapipeline_spark.operators.corpus import (
    remove_boilerplate,
)

from tests.conftest import SF_DIR


def test_pca_variance_ordering_and_shape(spark):
    # the registry face unpacks all 8 coordinates to scalar columns
    # (driver-hashable — the r4 red-row lesson); variance ordering
    # must hold across the unpacked matrix
    df = P.pca_embeddings_full(spark, SF_DIR)
    names = [f"pc{i}" for i in range(1, 9)]
    assert df.columns == ["vec_id", "label"] + names
    rows = df.collect()
    assert len(rows) == 500
    mat = np.array([[r[n] for n in names] for r in rows])
    var = mat.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(7))
    # the unpacked coords match the array-valued projection
    arr = {
        r.vec_id: r.pc
        for r in P.pca_project(
            P.table(spark, SF_DIR, "embeddings"), "embedding", k=8
        )
        .select("vec_id", "pc")
        .collect()
    }
    assert all(
        r.pc1 == arr[r.vec_id][0] and r.pc2 == arr[r.vec_id][1]
        for r in rows
    )


def test_pca_full_rank_preserves_distances(spark):
    # k = d: the projection is an orthonormal change of basis, so all
    # pairwise distances survive to float precision
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(40, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(40)],
        "id long, v array<double>",
    )
    out = P.pca_project(df, "v", k=6)
    got = {r.id: np.array(r.pc) for r in out.collect()}
    for a in range(0, 40, 7):
        for b in range(1, 40, 11):
            want = np.linalg.norm(pts[a] - pts[b])
            have = np.linalg.norm(got[a] - got[b])
            assert abs(want - have) < 1e-6


def test_remove_boilerplate_strips_planted_phrase(spark):
    # 30 docs share a verbatim banner; each also has unique content.
    # With df_cap below 30 the banner's tokens vanish from every doc
    # while the unique tails survive untouched.
    banner = "subscribe to our newsletter today"
    docs = [
        (i, f"{banner} unique{i} content{i} words{i}") for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate(df, "doc_id", "text", df_cap=10).collect()
    }
    for i in range(30):
        r = out[i]
        assert r.n_tokens == 8
        assert r.n_removed == 5
        assert r.clean_text == f"unique{i} content{i} words{i}"


def test_remove_boilerplate_noop_below_cap(spark):
    docs = [(i, f"totally distinct text number {i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = remove_boilerplate(df, "doc_id", "text", df_cap=10)
    assert out.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_remove_boilerplate_keeps_short_docs_whole(spark):
    """1- and 2-token documents have no trigrams, so they can never be
    flagged as boilerplate even when their words saturate the df cap
    elsewhere. Regression for the i=1 gram emitted on short docs."""
    rows = [(i, "common words repeated across docs") for i in range(20)]
    rows += [(100, "common"), (101, "common words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate(df, "doc_id", "text", df_cap=5).collect()
    }
    assert out[100].n_removed == 0 and out[100].clean_text == "common"
    assert out[101].n_removed == 0 and out[101].clean_text == "common words"
    # the long docs ARE fully boilerplate at this cap
    assert out[0].n_removed == out[0].n_tokens


def test_pca_contract_face_flags_true(spark):
    """The r8 registry contract face: exact halves match the table
    and both eigenbasis booleans hold."""
    rows = P.pca_embeddings(spark, SF_DIR).collect()
    assert [r.component for r in rows] == list(range(1, P.PCA_K + 1))
    for r in rows:
        assert r.dim == 64 and r.n_rows > 0
        assert r.var_nonincreasing and r.orthonormal_ok
