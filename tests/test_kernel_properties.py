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


@st.composite
def _change_streams(draw):
    n = draw(st.integers(1, 24))
    rows = []
    for i in range(n):
        k = draw(st.integers(1, 3))
        attr = draw(st.sampled_from(["A", "B", "C"]))
        day = draw(st.integers(1, 12))
        rows.append((k, attr, f"2024-01-{day:02d}", i))
    return rows


def _reference_scd2(rows):
    """Sequential gaps-and-islands over (key, attr, date, id) rows
    ordered by (date, id) within key — independent of the windowed
    implementation."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, attr, d, i in rows:
        by_key[k].append((d, i, attr))
    out = []
    for k, seq in by_key.items():
        seq.sort()
        islands = []  # [attr, from_date, n_rows]
        for d, _i, attr in seq:
            if islands and islands[-1][0] == attr:
                islands[-1][2] += 1
            else:
                islands.append([attr, d, 1])
        for idx, (attr, frm, n) in enumerate(islands):
            nxt = islands[idx + 1][1] if idx + 1 < len(islands) else None
            out.append((k, frm, attr, nxt, nxt is None, n))
    return sorted(out, key=_iv_key)


def _iv_key(t):
    # None effective_to sorts as "" — two same-day same-attr islands
    # of one key can differ only there, and None<str comparison raises
    return (t[0], t[1], t[2], t[3] or "", t[4], t[5])


@settings(max_examples=12, deadline=None)
@given(rows=_change_streams())
def test_scd2_matches_sequential_reference(spark, rows):
    """The windowed SCD2 kernel == a sequential per-key scan on random
    change streams — same-day flips, reopened attribute runs, and
    single-row keys included."""
    from doeecommerce_datapipeline_spark.operators.scd import scd2

    df = spark.createDataFrame(
        rows, "k long, attr string, d string, id long"
    ).withColumn("d", F.to_date("d"))
    out = scd2(
        df,
        key="k",
        attr="attr",
        order=[F.col("d").asc(), F.col("id").asc()],
        event_date=F.col("d"),
    )
    got = sorted(
        (
            (
                r["k"],
                str(r["effective_from"]),
                r["attr"],
                str(r["effective_to"]) if r["effective_to"] else None,
                r["is_current"],
                r["n_rows"],
            )
            for r in out.collect()
        ),
        key=_iv_key,
    )
    # sorted multisets, not a dict: two same-day islands of one key
    # share (k, effective_from), and dict keying would hide one
    assert got == _reference_scd2(rows)


def _ref_shingles(text, n=3):
    toks = text.lower().split()
    if len(toks) <= n - 1:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@st.composite
def _shingle_corpora(draw):
    # small vocabulary so documents actually overlap
    vocab = ["red", "blue", "fox", "dog", "runs", "fast", "home"]
    n = draw(st.integers(2, 12))
    docs = []
    for i in range(n):
        k = draw(st.integers(1, 8))
        words = [draw(st.sampled_from(vocab)) for _ in range(k)]
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=10, deadline=None)
@given(docs=_shingle_corpora(), tau=st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_jaccard_join_is_lossless(spark, docs, tau):
    """The PPJoin prefix filter must lose NO qualifying pair and admit
    no false positive at any threshold — pinned against brute-force
    all-pairs Jaccard over the same 3-word shingle sets on random
    overlapping corpora."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, tau=tau).collect()
    }
    sh = {i: _ref_shingles(t) for i, t in docs}
    want = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            j = inter / union if union else 0.0
            if j >= tau:
                want[(a, b)] = j
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-9, pair


def _reference_lloyd(vecs, k, seed, iters, fit_sample):
    """Sequential numpy reference of build_ivf_index's training loop:
    same stride sample, same seeded k-means++ init (shared driver-side
    code — the property isolates the DISTRIBUTED pieces: Arrow-batched
    assignment + per-partition partial sums), then plain sequential
    Lloyd with the same tie rule (argmin first-match) and the same
    empty-cluster-keeps-previous rule."""
    import numpy as np

    from doeecommerce_datapipeline_spark.operators.ivf import (
        _kmeanspp_init,
    )

    pts = np.asarray(vecs, dtype=np.float64)
    n = len(pts)
    stride = max(1, n // fit_sample)
    sample = [list(map(float, pts[i])) for i in range(n) if i % stride == 0]
    cents = np.asarray(_kmeanspp_init(sample, k, seed), dtype=np.float64)
    for _ in range(iters):
        d2 = (
            (pts * pts).sum(axis=1)[:, None]
            - 2.0 * (pts @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        cid = np.argmin(d2, axis=1)
        new = []
        for i in range(k):
            members = pts[cid == i]
            new.append(
                members.sum(axis=0) / len(members)
                if len(members)
                else cents[i]
            )
        cents = np.asarray(new)
    d2 = (
        (pts * pts).sum(axis=1)[:, None]
        - 2.0 * (pts @ cents.T)
        + (cents * cents).sum(axis=1)
    )
    return cents, np.argmin(d2, axis=1)


@st.composite
def _int_vector_sets(draw):
    n = draw(st.integers(12, 60))
    dim = draw(st.integers(2, 6))
    seed = draw(st.integers(0, 2**31 - 1))
    import numpy as np

    rng = np.random.default_rng(seed)
    # INTEGER-valued coordinates: partial sums are exact in float64
    # regardless of partition summation order, so distributed ==
    # sequential must hold bit-for-bit, not approximately
    return rng.integers(-50, 51, size=(n, dim)).astype(float), draw(
        st.integers(2, 6)
    )


@settings(max_examples=8, deadline=None)
@given(vk=_int_vector_sets(), n_parts=st.integers(1, 7))
def test_distributed_lloyd_matches_sequential_reference(spark, vk, n_parts):
    """build_ivf_index's distributed training (Arrow assignment +
    per-partition partial sums, no shuffle) == sequential numpy Lloyd
    on integer-valued vectors, under ANY partitioning — centroids and
    final assignments both. Isolates the two distributed kernels; the
    shared seeded init keeps the comparison deterministic."""
    vecs, k = vk
    from doeecommerce_datapipeline_spark.operators.ivf import (
        build_ivf_index,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(n_parts)
    assigned, cents = build_ivf_index(df, n_clusters=k, seed=7, lloyd_iters=2)
    got_cents = [[float(x) for x in c] for c in cents]
    got_assign = {
        r["vec_id"]: r["cluster_id"] for r in assigned.collect()
    }
    want_cents, want_assign = _reference_lloyd(
        vecs, k, seed=7, iters=2, fit_sample=2048
    )
    assert got_cents == [[float(x) for x in c] for c in want_cents]
    assert got_assign == {i: int(c) for i, c in enumerate(want_assign)}


def _reference_pq(vecs, m, k, seed, iters, fit_sample):
    """Sequential numpy reference of train_pq_codebooks: same stride
    sample + per-subspace seeded init (seed + j), then sequential
    per-subspace Lloyd with argmin-first-match ties and
    empty-codeword-keeps-previous."""
    import numpy as np

    from doeecommerce_datapipeline_spark.operators.ivf import (
        _kmeanspp_init,
    )

    pts = np.asarray(vecs, dtype=np.float64)
    n, dim = pts.shape
    stride = max(1, n // fit_sample)
    sample = pts[[i for i in range(n) if i % stride == 0]]
    ss = sample.reshape(len(sample), m, dim // m)
    books = [
        np.asarray(
            _kmeanspp_init([list(v) for v in ss[:, j, :]], k, seed + j),
            dtype=np.float64,
        )
        for j in range(m)
    ]
    sub = pts.reshape(n, m, dim // m)
    for _ in range(iters):
        new = []
        for j in range(m):
            x = sub[:, j, :]
            c = books[j]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)
            )
            cid = np.argmin(d2, axis=1)
            nb = []
            for ci in range(k):
                members = x[cid == ci]
                nb.append(
                    members.sum(axis=0) / len(members)
                    if len(members)
                    else c[ci]
                )
            new.append(np.asarray(nb))
        books = new
    return [[list(map(float, row)) for row in b] for b in books]


@settings(max_examples=6, deadline=None)
@given(vk=_int_vector_sets(), n_parts=st.integers(1, 7))
def test_distributed_pq_training_matches_sequential_reference(
    spark, vk, n_parts
):
    """train_pq_codebooks' distributed per-subspace partial sums ==
    sequential numpy Lloyd per subspace on integer-valued vectors,
    under ANY partitioning — the PQ twin of the IVF Lloyd property."""
    vecs, k = vk
    import numpy as np

    # dim must divide evenly by m: pad columns to a multiple of 2
    if vecs.shape[1] % 2:
        vecs = np.concatenate([vecs, vecs[:, :1]], axis=1)
    m = 2
    from doeecommerce_datapipeline_spark.operators.pq import (
        train_pq_codebooks,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(n_parts)
    got = train_pq_codebooks(df, m=m, k=k, seed=11, lloyd_iters=2)
    want = _reference_pq(vecs, m, k, seed=11, iters=2, fit_sample=2048)
    assert [[list(map(float, r)) for r in b] for b in got] == want
