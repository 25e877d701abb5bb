"""Semantic-property tests for the corpus-prep operators.

The oracle parity test (test_parity.py) proves engine equality; these
prove the operators mean what they claim — contamination flags planted
overlap, quality rules fire on the pathologies they name, packing
respects the budget, pseudonyms are consistent and salt-dependent.
"""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.corpus import (
    PACK_BUDGET,
    contamination_hits,
    pack_sequences,
    pseudonymize_events,
    quality_rules,
    source_mix_sample,
)

SF = "/root/testdata/sf0.001"


def test_contamination_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # shares the 5-gram "gamma delta epsilon zeta eta"
            (1, "prefix words gamma delta epsilon zeta eta suffix tail end"),
            (2, "completely unrelated content about spark parquet shuffle joins"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_hits(train, bench, "doc_id", "text").collect()
    }
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)


def test_quality_rules_fire_on_named_pathologies(spark):
    ok = " ".join(f"w{i}" for i in range(30))
    short = "just five words right here"
    repetitive = " ".join(["spam"] * 15 + ["a", "b", "c", "d", "e"] * 3)
    df = spark.createDataFrame(
        [(1, ok), (2, short), (3, repetitive)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["reason"], r["keep"])
        for r in quality_rules(df, "doc_id", "text").collect()
    }
    assert out[1] == ("ok", True)
    assert out[2] == ("too_short", False)
    assert out[3][1] is False and out[3][0] in ("repetitive", "dominant_word")


def test_source_mix_is_deterministic_and_rate_bounded(spark):
    a = source_mix_sample(spark, SF)
    b = source_mix_sample(spark, SF)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    assert a.where(F.col("bucket") >= F.col("rate_pct")).count() == 0
    # rates genuinely differ by source (the mixing knob does something)
    assert a.select("rate_pct").distinct().count() > 1


def test_pack_sequences_prefix_sums_are_consistent(spark):
    rows = pack_sequences(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for docs in by_src.values():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["seq_id"] == cum // PACK_BUDGET
            assert r["seq_offset"] == cum % PACK_BUDGET
            cum += r["n_tokens"]
        # every budget boundary was crossed in order: seq_ids are a
        # non-decreasing sequence starting at 0
        assert docs[0]["seq_id"] == 0


def test_pseudonyms_consistent_within_user_distinct_across(spark):
    out = pseudonymize_events(spark, SF)
    from doeecommerce_datapipeline_spark.io import table

    per_user = out.join(
        table(spark, SF, "events").select("event_id", "user_id"), "event_id"
    )
    g = per_user.groupBy("user_id").agg(
        F.countDistinct("user_token").alias("n_tokens")
    )
    assert g.where(F.col("n_tokens") != 1).count() == 0
    n_users = per_user.select("user_id").distinct().count()
    n_tokens = per_user.select("user_token").distinct().count()
    assert n_tokens == n_users
    # raw ids never appear in the output schema
    assert "user_id" not in out.columns


def test_chunk_tokens_overlap_and_remainder(spark):
    from doeecommerce_datapipeline_spark.operators.corpus import chunk_tokens

    words = [f"w{i}" for i in range(40)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    chunks = sorted(
        chunk_tokens(df, "doc_id", "text", size=16, stride=12).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 1, 13, 25, 37 -> 4 chunks; last is the 4-token remainder
    assert [r["chunk_id"] for r in chunks] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in chunks] == [16, 16, 16, 4]
    assert chunks[0]["chunk_text"].split() == words[0:16]
    assert chunks[1]["chunk_text"].split() == words[12:28]  # 4-token overlap
    assert chunks[3]["chunk_text"].split() == words[36:40]
    # every token position is covered
    covered = set()
    for r in chunks:
        covered.update(r["chunk_text"].split())
    assert covered == set(words)


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    from doeecommerce_datapipeline_spark.operators.corpus import (
        stratified_sample,
    )

    s1 = stratified_sample(spark, sf_dir, n_per_class=5).collect()
    per_class = {}
    for r in s1:
        per_class.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 5 for v in per_class.values())
    # deterministic under re-evaluation
    s2 = stratified_sample(spark, sf_dir, n_per_class=5).collect()
    assert {(r["doc_id"]) for r in s1} == {(r["doc_id"]) for r in s2}
    # a larger n strictly extends the smaller sample (prefix property)
    s3 = stratified_sample(spark, sf_dir, n_per_class=8).collect()
    assert {r["doc_id"] for r in s1} <= {r["doc_id"] for r in s3}


def test_source_overlap_matrix_is_canonical_and_complete(spark, sf_dir):
    from doeecommerce_datapipeline_spark.operators.corpus import (
        source_overlap_matrix,
        split_leakage_pairs,
    )

    rows = source_overlap_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["source_a"] <= r["source_b"]  # unordered-pair canon
        assert 0.2 <= r["max_jaccard"] <= 1.0
        assert r["n_pairs"] >= 1
    # every near-dup pair lands in exactly one cell
    n_pairs_total = sum(r["n_pairs"] for r in rows)
    assert n_pairs_total == split_leakage_pairs(spark, sf_dir).count()


def test_split_leakage_flags_cross_split_pairs(spark, sf_dir):
    from doeecommerce_datapipeline_spark.operators.corpus import (
        split_leakage_pairs,
    )

    rows = split_leakage_pairs(spark, sf_dir).collect()
    assert rows  # planted near-dups exist at every SF
    for r in rows:
        assert r["leaks"] == (r["split_a"] != r["split_b"])
        assert r["jaccard"] >= 0.2
        assert r["id_a"] < r["id_b"]


def test_bigrams_safe_on_short_documents(spark):
    """sequence(1, size-1) counts DOWN to [1, 0] when size == 1 and
    crashes under ANSI mode — the shared slice/zip_with builder must
    yield an empty array instead (matching the DuckDB oracle, which
    emits nothing for sub-2-token docs)."""
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.functions.text import bigrams

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "   "), (4, "two words"),
         (5, "a b c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(bigrams(F.col("text"))).alias("n")
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}


def test_quality_rules_hof_equals_explode_reference(spark):
    """r9 optimization guard: quality_rules switched from an explode →
    two-level aggregate to per-row array expressions (size /
    array_distinct / sorted run-length fold). Pin the value identity
    on adversarial docs — blank text (one empty-string token), ties
    for the top word, runs at array boundaries, a null text row
    (excluded by both shapes)."""
    from doeecommerce_datapipeline_spark.functions.text import tokens

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),
            (2, ""),
            (3, "   "),
            (4, "x"),
            (5, "b a b a"),           # tie: both words twice
            (6, "z z z z"),           # run at the array tail
            (7, "Mixed CASE mixed case MIXED"),
            (8, None),
            (9, " ".join(f"w{i % 7}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in quality_rules(docs, "doc_id", "text").collect()
    }
    # inline reference: the former explode → two-level aggregate
    chars = F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias(
        "chars"
    )
    toks = docs.select(
        "doc_id", chars, F.explode(tokens(F.lower(F.col("text")))).alias("w")
    )
    per_word = toks.groupBy("doc_id", "chars", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    ref = {
        r["doc_id"]: r
        for r in per_word.groupBy("doc_id", "chars")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_count"),
        )
        .collect()
    }
    assert set(got) == set(ref)  # row universe identical (8 absent)
    for k, r in ref.items():
        g = got[k]
        assert g["n_tokens"] == r["n_tokens"], k
        exp_dr = r["n_distinct"] / r["n_tokens"]
        exp_tf = r["top_count"] / r["n_tokens"]
        exp_wl = r["chars"] / r["n_tokens"]
        assert g["distinct_ratio"] == exp_dr, k
        assert g["top_frac"] == exp_tf, k
        assert g["mean_wlen"] == exp_wl, k
