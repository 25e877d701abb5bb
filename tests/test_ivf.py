"""IVF ANN: probe correctness and recall vs brute force.

The quantizer is the distributed-Lloyd build (seeded k-means++ init on
a bounded sample, full-table refinement passes) — the recall floor is
the explicit quality gate VERDICT r2 asked for.
"""

from doeecommerce_datapipeline_spark.operators.ivf import (
    N_CLUSTERS,
    N_PROBE,
    build_ivf_index,
    ivf_recall_vs_exact,
    ivf_topk,
    ivf_topk_full,
)
from doeecommerce_datapipeline_spark.io import table


def test_ivf_topk_full_shape(spark, sf_dir):
    rows = ivf_topk_full(spark, sf_dir, 0, 10).collect()
    assert len(rows) == 10
    cosines = [r["cos"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_contract_face(spark, sf_dir):
    """The r9 registry face: one row of exact halves + pinned
    booleans (the oracle-pairing contract)."""
    rows = ivf_topk(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n = table(spark, sf_dir, "embeddings").count()
    assert r["n_vectors"] == n and r["n_nonzero_norm"] == n
    assert r["dim"] == 64 and r["k"] == 10
    assert r["n_results_eq_k"] is True
    assert r["cos_bounded"] is True
    assert r["recall_ge_floor"] is True


def test_ivf_recall_floor(spark, sf_dir):
    # measured 0.6 at sf0.001 and sf0.01 with 16 clusters / 4 probes;
    # the floor 0.5 is 2x the 4/16 = 0.25 blind-probe baseline, so it
    # fails if the quantizer stops learning structure (FP summation
    # order may wiggle centroids slightly — hence floor < measured)
    assert ivf_recall_vs_exact(spark, sf_dir) >= 0.5
    assert N_PROBE / N_CLUSTERS <= 0.25


def test_lloyd_refinement_improves_quantizer(spark, sf_dir):
    # the whole point of the distributed Lloyd passes: within-cluster
    # squared distance (k-means cost) must not increase vs init-only
    import numpy as np

    e = table(spark, sf_dir, "embeddings")
    pts = np.asarray(
        [r["embedding"] for r in e.select("embedding").collect()],
        dtype=np.float64,
    )

    def cost(centroids):
        c = np.asarray(centroids)
        d2 = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    _, cents0 = build_ivf_index(e, lloyd_iters=0)
    _, cents3 = build_ivf_index(e, lloyd_iters=3)
    assert cost(cents3) <= cost(cents0) * 1.0001


def test_empty_cluster_keeps_previous_centroid(spark):
    # 3 identical points, k=2: one cluster is empty every iteration;
    # the build must not divide by zero or drop a centroid
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = build_ivf_index(df, n_clusters=2, lloyd_iters=2)
    assert len(cents) == 2
    assert assigned.count() == 3


def test_ann_recall_eval_floors(spark):
    """The scoreboard runs both indexes over the 5-query panel and
    every recall respects the family's documented floors."""
    from doeecommerce_datapipeline_spark.operators.similarity import (
        ann_recall_eval_full,
    )

    rows = ann_recall_eval_full(spark, "/root/testdata/sf0.001").collect()
    by_m = {}
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        by_m.setdefault(r.method, []).append(r.recall)
    assert set(by_m) == {"ivf", "pq"}
    assert len(by_m["ivf"]) == 5 and len(by_m["pq"]) == 5
    assert sum(by_m["ivf"]) / 5 >= 0.4   # IVF panel-mean floor
    assert sum(by_m["pq"]) / 5 >= 0.2    # PQ panel-mean floor


def test_ann_recall_eval_batched_equals_loop(spark):
    """The round-5 batched scoreboard (one scan per method, per-query
    rank windows, join-based hit counting) must reproduce the
    original per-query driver loop row-for-row — same trained state
    by seeded determinism, so any divergence is a scoring/ranking
    bug in the batched path."""
    from doeecommerce_datapipeline_spark.operators.similarity import (
        _ann_recall_eval_loop,
        ann_recall_eval_full,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in ann_recall_eval_full(spark, sf).collect()]
    want = [tuple(r) for r in _ann_recall_eval_loop(spark, sf).collect()]
    assert got == want


def test_cos_multi_udf_matches_hof_cosine(spark):
    """The Arrow multi-query cosine kernel must agree with the
    JVM-side zip_with/aggregate fold to float tolerance on random
    vectors — the seam the batched scoreboard's truth ranking rides."""
    import numpy as np
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.functions.vectors import cosine
    from doeecommerce_datapipeline_spark.operators.similarity import (
        _cos_multi_udf,
    )

    rng = np.random.default_rng(11)
    d = 16
    queries = {qid: [float(x) for x in rng.normal(size=d)] for qid in (3, 9)}
    rows = [
        (i, qid, [float(x) for x in rng.normal(size=d)])
        for i in range(40)
        for qid in queries
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, query_id long, v array<float>"
    )
    qlit = {
        qid: F.array(*[F.lit(x) for x in vec]) for qid, vec in queries.items()
    }
    hof = F.when(F.col("query_id") == 3, cosine("v", qlit[3])).otherwise(
        cosine("v", qlit[9])
    )
    cosm = _cos_multi_udf(queries)
    out = df.select(
        "vec_id",
        "query_id",
        cosm(F.col("query_id"), F.col("v")).alias("np_cos"),
        hof.alias("hof_cos"),
    ).collect()
    assert len(out) == 80
    for r in out:
        assert abs(r.np_cos - r.hof_cos) < 1e-12, r


def test_adc_multi_udf_matches_single_query_adc(spark):
    """The multi-LUT ADC kernel must reproduce the single-query ADC
    scores to float tolerance for every panel query."""
    import numpy as np
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.operators.pq import (
        _adc_cos_multi_udf,
        _adc_cos_udf,
    )

    rng = np.random.default_rng(23)
    m, k, dsub = 4, 8, 4
    books = rng.normal(size=(m, k, dsub)).tolist()
    queries = {
        qid: [float(x) for x in rng.normal(size=m * dsub)] for qid in (1, 5)
    }
    codes = [
        [int(c) for c in rng.integers(0, k, size=m)] for _ in range(30)
    ]
    rows = [(i, qid, codes[i]) for i in range(30) for qid in queries]
    df = spark.createDataFrame(
        rows, "vec_id long, query_id long, pq_code array<int>"
    )
    multi = _adc_cos_multi_udf(queries, books)
    got = {
        (r.vec_id, r.query_id): r.c
        for r in df.select(
            "vec_id",
            "query_id",
            multi(F.col("query_id"), F.col("pq_code")).alias("c"),
        ).collect()
    }
    for qid, qv in queries.items():
        single = _adc_cos_udf(qv, books)
        sdf = spark.createDataFrame(
            [(i, codes[i]) for i in range(30)],
            "vec_id long, pq_code array<int>",
        )
        want = {
            r.vec_id: r.c
            for r in sdf.select(
                "vec_id", single(F.col("pq_code")).alias("c")
            ).collect()
        }
        for i in range(30):
            assert abs(got[(i, qid)] - want[i]) < 1e-12
