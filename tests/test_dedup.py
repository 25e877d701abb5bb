"""Recall tests for the hash-seeded (rows-only) dedup/ANN operators —
these have no SQL oracle, so planted duplicates are the ground truth."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_signatures,
)
from doeecommerce_datapipeline_spark.operators.similarity import lsh_bucket


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("lazy", "sleepy")  # one word differs
    other = "completely different words about spark query engines and parquet columnar files"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", 0.3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_hamming_zero(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "unrelated totally different content here")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert bin(sigs[1] ^ sigs[3]).count("1") > 3


def test_lsh_bucket_duplicate_vector_shares_bucket(spark):
    v = [float(i % 7) / 7.0 - 0.4 for i in range(64)]
    w = [1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, w)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    buckets = {r["vec_id"]: r["bucket"] for r in lsh_bucket(df).collect()}
    assert buckets[0] == buckets[1]


def test_connected_components_converges_on_chain(spark):
    """A diameter-4 chain (1-2-3-4-5) needs 4 propagation rounds — a
    fixed 3-round unroll mislabels the far end. The fix-point loop must
    collapse the whole chain to component 1."""
    from doeecommerce_datapipeline_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["src", "dst"]
    )
    labels = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7}


def test_star_cc_matches_fixpoint_on_skewed_graph(spark):
    """Skewed star (hub 10 with 30 spokes) + a chain grafted onto one
    spoke + isolated nodes: the alternating-star labels must equal the
    fix-point labels node-for-node."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    star = [(10, s) for s in range(11, 41)]  # hub + 30 spokes
    chain = [(40 + i, 41 + i) for i in range(6)]  # grafted at node 40
    cross = [(5, 10)]  # drags the hub component's min below the hub
    und = star + chain + cross
    nodes = spark.createDataFrame(
        [(i,) for i in range(5, 50)], ["doc_id"]
    )
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    fix = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    star_labels = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert star_labels == fix
    # the whole star+chain collapses to min id 5; untouched ids isolate
    assert star_labels[46] == 5 and star_labels[10] == 5
    assert star_labels[6] == 6


def test_star_cc_logarithmic_rounds_on_long_chain(spark):
    """A 32-node chain: label propagation needs 31 rounds (one hop per
    round); the star rewrite halves path lengths, so it must converge
    in far fewer — the measurable O(log n) claim."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        _alternating_star_cc,
    )

    n = 32
    chain = [(i, i + 1) for i in range(n - 1)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["src", "dst"]
    )
    labels, rounds = _alternating_star_cc(nodes, edges)
    assert {r["component"] for r in labels.collect()} == {0}
    assert rounds <= 8, f"expected O(log n) rounds, got {rounds}"


def test_jaccard_df_cap_drops_stop_shingles(spark):
    """Docs that only share a corpus-wide boilerplate phrase must NOT
    pair up once the shingle's document frequency exceeds the cap —
    while genuinely near-duplicate docs still do."""
    from doeecommerce_datapipeline_spark.operators.dedup import jaccard_pairs_over

    boiler = "all rights reserved by the publisher"
    rows = [
        (
            i,
            f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} foxtrot{i} {boiler}",
        )
        for i in range(20)
    ]
    # one genuine near-dup pair sharing rare shingles
    rows += [
        (100, "spark shuffles partition data across the cluster tonight"),
        (101, "spark shuffles partition data across the cluster today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]) for r in jaccard_pairs_over(df, df_cap=10).collect()
    }
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), f"boilerplate-only pairs leaked: {pairs}"


def test_minhash_on_documents_overlaps_exact_jaccard(spark, sf_dir):
    """The LSH candidates at est≥0.5 must all be genuine high-jaccard
    pairs found by the exact operator (precision check on real data)."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        minhash_dedup_docs,
        ngram_jaccard_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    cand = [
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_dedup_docs(spark, sf_dir).collect()
        if r["id_a"] < 1000 and r["id_b"] < 1000
    ]
    for a, b, est in cand:
        assert (a, b) in exact, f"LSH pair ({a},{b}) est={est} not in exact jaccard pairs"


def test_near_dedup_corpus_keeps_one_canonical_per_cluster(spark, sf_dir):
    """Kept docs are each cluster's min id; cluster sizes partition the
    corpus; removed docs are exactly the non-canonical members."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        dedup_components,
        near_dedup_corpus,
    )

    comp = {
        r["doc_id"]: r["component"]
        for r in dedup_components(spark, sf_dir).collect()
    }
    kept = {
        r["doc_id"]: r["cluster_size"]
        for r in near_dedup_corpus(spark, sf_dir).collect()
    }
    # every kept doc is its own component's label (the min member)
    for d in kept:
        assert comp[d] == d
    # the kept set is exactly the distinct component labels
    assert set(kept) == set(comp.values())
    # cluster sizes partition the corpus
    assert sum(kept.values()) == len(comp)


def test_incremental_dedup_pipeline_across_ingests(spark, tmp_path):
    """Two ingests against the ACID fingerprint table: batch-2 docs
    whose content arrived in batch 1 are dropped; within-batch dups
    keep the min id; the fingerprint table accumulates survivors."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        incremental_dedup_pipeline,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable

    fp_path = str(tmp_path / "corpus_fps")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "Alpha  beta GAMMA")],
        "doc_id long, text string",
    )
    kept1 = incremental_dedup_pipeline(spark, b1, fp_path)
    # 3 normalizes to 1's fingerprint → within-batch dup, min id wins
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]

    b2 = spark.createDataFrame(
        [(10, "delta epsilon"), (11, "zeta eta"), (12, "zeta  ETA"), (13, "theta")],
        "doc_id long, text string",
    )
    kept2 = incremental_dedup_pipeline(spark, b2, fp_path)
    # 10 duplicates batch-1 content; 12 duplicates 11 within-batch
    assert sorted(r["doc_id"] for r in kept2.collect()) == [11, 13]

    fps = ManifestTable(spark, fp_path).read()
    assert fps.count() == 4  # 1, 2, 11, 13
    assert fps.select("fp").distinct().count() == 4


def test_incremental_near_dup_pipeline_across_ingests(spark, tmp_path):
    """Near-dup index across two ingests: batch-2 docs near-duplicating
    batch-1 content are dropped via the stored band table; within-batch
    near-dups keep the smaller id; novel docs survive and extend the
    index."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        incremental_near_dup_pipeline,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry heavy wooden crates across the shallow "
        "river during a long summer afternoon near the old mill"
    )
    other = (
        "completely different content about distributed query engines "
        "optimizing shuffle partitions and broadcast joins under heavy "
        "skew with adaptive execution and columnar parquet scans"
    )
    idx = str(tmp_path / "lsh_index")
    b1 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    kept1 = incremental_near_dup_pipeline(spark, b1, idx)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]

    near_base = base.replace("mill", "barn")  # 1 token changed
    near_base2 = base.replace("summer", "winter")
    novel = (
        "a third unrelated passage describing byzantine consensus "
        "protocols with quorum intersection leader election and log "
        "replication across partitioned replicas in five data centers"
    )
    novel_near = novel.replace("five", "nine")
    b2 = spark.createDataFrame(
        [(10, near_base), (11, novel), (12, novel_near), (13, near_base2)],
        "doc_id long, text string",
    )
    kept2 = incremental_near_dup_pipeline(spark, b2, idx)
    # 10, 13 near-dup batch-1's doc 1 via the index; 12 near-dups 11
    # within the batch (11 wins)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [11]

    sigs = ManifestTable(spark, idx + "/sigs").read()
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1, 2, 11]
    bands = ManifestTable(spark, idx + "/bands").read()
    assert bands.select("doc_id").distinct().count() == 3


def test_prefix_jaccard_exact_vs_brute_force_with_hot_shingle(spark):
    """The prefix filter must be LOSSLESS even when one shingle appears
    in every document (the df-cap approach in ngram_jaccard_pairs
    drops such stop-shingles from the sets; prefix filtering must not
    lose the pair, only skip the hot key during candidate gen)."""
    from doeecommerce_datapipeline_spark.functions.text import word_shingles
    from doeecommerce_datapipeline_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )
    from pyspark.sql import functions as F

    hot = "the quick brown"  # shared 3-token run -> hot shingle in all
    docs = [
        (1, "the quick brown fox jumps over lazy dogs tonight"),
        (2, "the quick brown fox jumps over lazy dogs today"),   # near-dup of 1
        (3, "the quick brown mill stands by the river bend"),
        (4, "completely different text about database query engines"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard)
        for r in prefix_jaccard_pairs(d, tau=0.5).collect()
    }

    # brute force over the same shingle sets
    sets = {
        r.doc_id: set(r.s)
        for r in d.select(
            "doc_id", word_shingles(F.col("text")).alias("s")
        ).collect()
    }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            j = inter / len(sets[a] | sets[b])
            if j >= 0.5:
                want[(a, b)] = (inter, j)
    assert set(got) == set(want) and (1, 2) in got
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12


def test_lsh_recall_eval_planted_dups(spark, tmp_path):
    """Planted exact duplicates are all true pairs AND all surfaced by
    LSH → recall 1.0 at every threshold; unrelated docs create no
    true pairs."""
    from doeecommerce_datapipeline_spark.operators.dedup import (
        lsh_recall_eval_full,
    )

    d = str(tmp_path / "sf_lsheval")
    dup = ("the quick brown fox jumps over the lazy dog and then "
           "runs far away into the deep dark woods tonight")
    rows = [(i, dup, "en", "s", 1) for i in range(6)]
    # noise docs with fully disjoint vocabularies (no shared shingles)
    rows += [
        (100 + i,
         " ".join(f"w{i}x{k}" for k in range(20)),
         "en", "s", 1)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(d + "/documents.parquet")
    out = {r.threshold: r for r in lsh_recall_eval_full(spark, d).collect()}
    for t in (0.3, 0.5, 0.7):
        r = out[t]
        assert r.n_true_pairs == 15  # C(6,2) duplicate pairs
        assert r.n_hit == 15 and r.recall == 1.0
