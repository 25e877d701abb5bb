"""PageRank: mass conservation, hub dominance, convergence direction."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.graph import pagerank


def _edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src string, dst string")


def test_pagerank_star_center_dominates(spark):
    # star: hub h connected to 6 leaves — h must out-rank every leaf,
    # and all leaves tie exactly (symmetry → identical arithmetic)
    e = _edges(spark, [("h", f"l{i}") for i in range(6)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    hub, leaves = ranks["h"], [v for k, v in ranks.items() if k != "h"]
    assert all(hub > lv for lv in leaves)
    assert len(set(leaves)) == 1


def test_pagerank_mass_conserved(spark):
    # symmetrized graph: every node has out-edges → no dangling leak;
    # teleport + damped mass keeps the total at 1 (up to the 1e-14
    # contribution quantization)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    total = pagerank(e).agg(F.sum("rank")).head()[0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_degree_monotone_on_path(spark):
    # path a-b-c-d-e: interior nodes out-rank endpoints
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert ranks["c"] > ranks["a"] and ranks["c"] > ranks["e"]
    assert ranks["b"] > ranks["a"] and ranks["d"] > ranks["e"]


def test_triangles_enumeration(spark):
    # K4 on {1,2,3,4} (4 triangles) + a pendant edge (no new triangle)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "u long, v long",
    )
    from doeecommerce_datapipeline_spark.operators.graph import triangles

    got = sorted(
        (r["id_a"], r["id_b"], r["id_c"]) for r in triangles(edges).collect()
    )
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]
