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


def test_kcore_peel_cascade_ledger(spark):
    # chain of triangles sharing single vertices: a-b-c, c-d-e, e-f-g.
    # At k=2 every node has degree >= 2, so the 2-core is the whole
    # graph (stable ledger). At k=3 only the shared vertices c and e
    # reach degree 4; the first peel removes all degree-2 nodes,
    # which drops c and e to degree 0 — a 2-round cascade to empty.
    from doeecommerce_datapipeline_spark.operators.graph import (
        kcore_peel_ledger,
    )

    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("d", "e"), ("c", "e"),
        ("e", "f"), ("f", "g"), ("e", "g"),
    ]
    both = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(both, "src string, dst string")

    stable = {
        (r.round, r.n_nodes, r.n_edges)
        for r in kcore_peel_ledger(e, k=2, rounds=2).collect()
    }
    assert stable == {(0, 7, 9), (1, 7, 9), (2, 7, 9)}

    cascade = {
        (r.round, r.n_nodes, r.n_edges)
        for r in kcore_peel_ledger(e, k=3, rounds=3).collect()
    }
    # round 1: only c,e survive the degree cut but share no edge;
    # the edge restriction leaves the single c-e edge, giving each
    # degree 1 — round 2 empties the graph and round 3 is a no-op
    assert cascade == {(0, 7, 9), (1, 2, 1), (2, 0, 0), (3, 0, 0)}


def test_copurchase_core_collapse_reaches_fixpoint(spark):
    # the fixed 4-round unroll must cover the full cascade at test
    # scale: the last two ledger rows are equal (fix-point reached),
    # so the reported profile is the TRUE k-core collapse, not a
    # truncation of it
    from doeecommerce_datapipeline_spark.operators.graph import (
        copurchase_core_collapse,
    )

    rows = sorted(
        copurchase_core_collapse(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].n_nodes > 0 and rows[0].n_edges > 0
    assert (rows[-1].n_nodes, rows[-1].n_edges) == (
        rows[-2].n_nodes,
        rows[-2].n_edges,
    )


def test_clustering_coefficient_planted(spark, tmp_path):
    """A triangle of recurring copurchases + a pendant edge: wedges
    and triangles count exactly; C = 3T/W."""
    import datetime

    from doeecommerce_datapipeline_spark.operators.graph import (
        copurchase_clustering,
    )

    d = str(tmp_path / "sf_cc")
    # orders: parts {1,2,3} co-bought together twice (triangle, all
    # edges support 2); parts {3,4} co-bought twice (pendant edge);
    # {1,5} co-bought ONCE (below support — must not appear)
    baskets = [[1, 2, 3], [1, 2, 3], [3, 4], [3, 4], [1, 5]]
    lrows = []
    for ok, parts in enumerate(baskets, 1):
        for ln, p in enumerate(parts, 1):
            lrows.append((ok, p, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                          datetime.datetime(1995, 1, 2)))
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(d + "/lineitem.parquet")
    r = copurchase_clustering(spark, d).collect()[0]
    # edges: (1,2),(1,3),(2,3),(3,4) — node 5 never enters
    assert r.n_nodes == 4 and r.n_edges == 4
    # degrees 1:2, 2:2, 3:3, 4:1 → wedges = 1+1+3+0 = 5
    assert r.n_wedges == 5 and r.n_triangles == 1
    assert abs(r.global_cc - 3.0 / 5.0) < 1e-9


def test_assortativity_star_is_negative(spark, tmp_path):
    """A star (hub co-bought with many leaves) is maximally
    DISassortative: r = -1."""
    import datetime

    from doeecommerce_datapipeline_spark.operators.graph import (
        copurchase_assortativity,
    )

    d = str(tmp_path / "sf_assort")
    lrows = []
    ok = 0
    # hub part 1 co-bought with each leaf 2..6, twice (support 2)
    for leaf in range(2, 7):
        for _ in range(2):
            ok += 1
            for ln, p in enumerate([1, leaf], 1):
                lrows.append((ok, p, 1, ln, 1.0, 10.0, 0.0, 0.0,
                              "N", "O",
                              datetime.datetime(1995, 1, 2)))
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(d + "/lineitem.parquet")
    r = copurchase_assortativity(spark, d).collect()[0]
    assert r.n_nodes == 6 and r.n_directed_edges == 10
    assert r.assortativity == -1.0
