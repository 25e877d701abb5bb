"""Property-based tests (hypothesis) for the distributed graph/packing
kernels — random graphs and corpora catch the topology/boundary cases
fixture-based units can't enumerate (odd-diameter chains, isolated
nodes, exact budget boundaries, empty shards)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _reference_components(n_nodes, edge_pairs):
    """Union-find ground truth: node -> min node id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label by component min (root IS the
    # min id because unions always re-root to the smaller id)
    return {x: find(x) for x in range(n_nodes)}


@st.composite
def _graphs(draw):
    n = draw(st.integers(2, 24))
    m = draw(st.integers(0, 30))
    edges = [
        tuple(
            sorted(
                (
                    draw(st.integers(0, n - 1)),
                    draw(st.integers(0, n - 1)),
                )
            )
        )
        for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    return n, edges


@settings(max_examples=12, deadline=None)
@given(g=_graphs())
def test_min_label_propagation_matches_union_find(spark, g):
    """Fix-point min-label propagation == union-find ground truth on
    arbitrary random graphs (including isolated nodes, self-dropped
    edges, multi-edges, and long chains whose diameter exceeds any
    fixed round count a naive implementation would pick)."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        connected_components,
    )

    n, edges = g
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    both = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    if both:
        e = spark.createDataFrame(both, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, e).collect()
    }
    want = _reference_components(n, edges)
    assert got == want


@st.composite
def _corpora(draw):
    n = draw(st.integers(1, 20))
    docs = []
    for i in range(n):
        shard = draw(st.sampled_from(["a", "b"]))
        n_words = draw(st.integers(1, 12))
        docs.append((i, shard, "w " * n_words))
    return docs


@settings(max_examples=12, deadline=None)
@given(docs=_corpora(), budget=st.integers(1, 15))
def test_pack_by_budget_matches_sequential_scan(spark, docs, budget):
    """The windowed prefix-sum packing == a sequential per-shard scan:
    same seq_id and seq_offset for every document at ANY budget,
    including budgets smaller than a single document (straddling) and
    exact-boundary hits."""
    from doeecommerce_datapipeline_spark.operators.corpus import (
        pack_by_budget,
    )

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_by_budget(
            df, "doc_id", "text", ["source"], budget=budget
        ).collect()
    }
    # sequential reference: exclusive running token count per shard
    want = {}
    for shard in ("a", "b"):
        cum = 0
        for i, sh, text in sorted(docs):
            if sh != shard:
                continue
            n_tok = len(text.split())
            want[i] = (cum // budget, cum % budget)
            cum += n_tok
    assert got == want
