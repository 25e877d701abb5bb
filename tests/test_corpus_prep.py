"""End-to-end invariants of the corpus-preparation pipeline."""

import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.functions.text import (
    fingerprint,
    word_shingles,
)
from doeecommerce_datapipeline_spark.io import table
from doeecommerce_datapipeline_spark.operators.corpus import (
    DECONTAM_NGRAM,
    PACK_BUDGET,
)
from doeecommerce_datapipeline_spark.pipelines.corpus_prep import prepare_corpus


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    return prepare_corpus(spark, sf_dir)


def test_funnel_monotonic_and_reconciles(spark, stages):
    rows = {r["stage"]: r["n_docs"] for r in stages["funnel"].collect()}
    order = sorted(rows)
    # each stage can only drop documents, until packing which is 1:1
    assert rows["0_input"] >= rows["1_quality"] >= rows["1b_corpus_quality"]
    assert rows["1b_corpus_quality"] >= rows["2_exact_dedup"]
    assert rows["2_exact_dedup"] >= rows["3_decontaminated"]
    # PII scrub rewrites rows, never drops them — exact conservation
    assert rows["3_decontaminated"] == rows["3b_pii_scrubbed"]
    assert rows["3b_pii_scrubbed"] == rows["4_split"] == rows["5_packed"]
    assert rows["5_packed"] > 0
    # and the stages must actually discriminate on this corpus
    assert rows["1_quality"] < rows["0_input"]
    assert rows["3_decontaminated"] < rows["2_exact_dedup"]
    assert order[0] == "0_input"


def test_no_duplicate_fingerprints_survive(stages):
    dupes = (
        stages["deduped"]
        .groupBy("fp")
        .count()
        .where("count > 1")
        .count()
    )
    assert dupes == 0


def test_no_contaminated_doc_survives(spark, sf_dir, stages):
    docs = table(spark, sf_dir, "documents")
    bench_sh = (
        docs.where(F.col("doc_id") % 20 == 7)
        .select(F.explode(word_shingles(F.col("text"), DECONTAM_NGRAM)).alias("s"))
        .distinct()
    )
    leaked = (
        stages["clean"]
        .select("doc_id", F.explode(word_shingles(F.col("text"), DECONTAM_NGRAM)).alias("s"))
        .join(bench_sh, "s")
        .count()
    )
    assert leaked == 0


def test_split_is_content_stable_and_complete(stages):
    s = stages["split"]
    assert s.where(~F.col("split").isin("train", "val", "test")).count() == 0
    # identical content must always land in one split (leakage-proof)
    cross = (
        s.select(fingerprint("text").alias("fp"), "split")
        .distinct()
        .groupBy("fp")
        .count()
        .where("count > 1")
        .count()
    )
    assert cross == 0
    # all three splits are populated at this corpus size
    assert s.select("split").distinct().count() == 3


def test_packing_offsets_are_exact_prefix_sums(stages):
    p = stages["packed"]
    # pack_by_budget contract: seq_id*budget + seq_offset reconstructs
    # the exclusive cumulative token count, so each doc must start
    # exactly where the previous one ended within its shard
    from pyspark.sql import Window

    cum = F.col("seq_id") * PACK_BUDGET + F.col("seq_offset")
    w = Window.partitionBy("split", "source").orderBy("doc_id")
    q = p.withColumn(
        "expected", F.coalesce(F.lag(cum + F.col("n_tokens")).over(w), F.lit(0))
    )
    assert q.where(cum != F.col("expected")).count() == 0
    # the within-sequence offset is always inside the budget
    assert p.where(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= PACK_BUDGET)
    ).count() == 0
    # and matches the registry operator's semantics on shared shards:
    # same column name, same meaning (offset within the sequence)


def test_materialize_sequences_roundtrip(spark):
    """Every doc appears in exactly one sequence, in offset order, and
    each sequence's token total stays under budget + one doc tail."""
    from doeecommerce_datapipeline_spark.operators.corpus import (
        materialize_sequences,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), " ".join(f"w{i}_{j}" for j in range(5 + i % 7)))
         for i in range(40)],
        "doc_id long, source string, text string",
    )
    seqs = materialize_sequences(docs, "doc_id", "text", ["source"], budget=20)
    rows = seqs.collect()
    # every doc exactly once
    all_ids = sorted(i for r in rows for i in r["doc_ids"])
    assert all_ids == list(range(40))
    for r in rows:
        # concatenation order = doc_id order within the shard (packing
        # orders by id), so doc_ids must be strictly increasing
        assert r["doc_ids"] == sorted(r["doc_ids"])
        # the sequence text is exactly its members' texts joined
        assert r["seq_text"].count(" ") + 1 == r["seq_tokens"]
        # bounded overflow: a straddling doc adds at most its own size
        assert r["seq_tokens"] <= 20 + 11
    # reconstruction: total tokens conserved
    total = docs.select(F.size(F.split("text", " ")).alias("n")).agg(
        F.sum("n")
    ).head()[0]
    assert sum(r["seq_tokens"] for r in rows) == total


def test_coverage_greedy_prefers_complementary_docs(spark, tmp_path):
    """Greedy picks the COMPLEMENT of round 1's coverage even when a
    redundant near-clone has more raw terms; marginal gains are
    non-increasing (submodularity)."""
    from doeecommerce_datapipeline_spark.operators.corpus import (
        coverage_greedy_docs,
    )

    d = str(tmp_path / "sf_cov")
    rows = [
        # doc 1: 6 bigrams (a b, b c, c d, d e, e f, f g)
        (1, "a b c d e f g", "en", "s", 1),
        # doc 2: near-clone of 1 — 5 bigrams, ALL covered by doc 1
        (2, "a b c d e f", "en", "s", 1),
        # doc 3: disjoint, only 3 bigrams — smaller but complementary
        (3, "x y z w", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(d + "/documents.parquet")
    out = sorted(coverage_greedy_docs(spark, d).collect(),
                 key=lambda r: r.round)
    assert out[0].doc_id == 1 and out[0].marginal_gain == 6
    assert out[1].doc_id == 3 and out[1].marginal_gain == 3  # not the clone
    # universe saturated: zero-gain docs are never picked — greedy
    # stops early instead of padding rounds with useless picks
    assert len(out) == 2
    gains = [r.marginal_gain for r in out]
    assert gains == sorted(gains, reverse=True)
    assert out[-1].covered_total == 9


def test_mcnemar_cells_and_symmetric_null(spark):
    """The four cells partition the joined corpus; on real data the
    chi2 equals the discordant-cell closed form."""
    from doeecommerce_datapipeline_spark.operators.corpus import (
        filter_mcnemar_test,
    )

    r = filter_mcnemar_test(spark, "/root/testdata/sf0.001").collect()[0]
    assert (r.both_keep + r.heuristic_only + r.ppl_only + r.both_drop
            == r.n_docs)
    b, c = r.heuristic_only, r.ppl_only
    assert abs(r.chi2 - (b - c) ** 2 / (b + c)) < 1e-6
    # all four cells populated — the median ppl cut discriminates
    assert min(r.both_keep, r.heuristic_only, r.ppl_only,
               r.both_drop) > 0


def test_scrubbed_corpus_scans_pii_clean(stages):
    """Post-scrub text contains zero detectable PII — the property the
    3b stage exists for (vacuously true on this digit-free corpus, but
    the scan exercises the full plumbing; PII-bearing inputs are
    covered by tests/test_pii.py)."""
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.operators.pii import pii_scan

    rescan = pii_scan(stages["scrubbed"], "doc_id", "text")
    assert rescan.where(F.col("has_pii")).count() == 0
