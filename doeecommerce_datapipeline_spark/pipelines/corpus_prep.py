"""End-to-end training-corpus preparation pipeline.

Chains the corpus operators into the flow an LLM data pipeline actually
runs — quality filter → exact dedup → benchmark decontamination →
content-hash split → sequence packing — and emits a per-stage funnel
report (the medallion-pipeline analog for training data; the reference
stops at BI gold marts, SURVEY.md §2).

Every stage is a pure DataFrame plan over the previous stage's output:
no driver-side loops, no collected intermediates. The funnel counts use
``count()`` per stage boundary (actions on narrow aggregates), matching
the reference's audit posture (records_fetched/loaded per stage,
ingestion/base_generator.py:177-228).

Scale posture: quality and split are scan-bound per-row expressions;
exact dedup is one fingerprint shuffle; decontamination broadcasts the
benchmark shingle set (no corpus shuffle); packing is one per-(split,
source) prefix-sum window. Nothing in the flow holds state proportional
to the corpus on any single node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens, word_shingles
from ..io import table
from ..operators.corpus import DECONTAM_NGRAM, PACK_BUDGET, quality_rules


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    bench_mod: int = 20,
    bench_rem: int = 7,
) -> dict[str, DataFrame]:
    """Run the full prep flow over the documents table.

    Documents with ``doc_id % bench_mod == bench_rem`` stand in for the
    held-out benchmark set (same convention as the decontaminate
    registry query). Returns the stage DataFrames:

    - ``quality``: docs surviving the Gopher-style rules
    - ``deduped``: one canonical doc per exact-content fingerprint
    - ``clean``: decontaminated survivors
    - ``split``: clean docs with train/val/test assignment
    - ``packed``: token-budget sequence assignments per (split, source)
    - ``funnel``: (stage, n_docs) — the audit report
    """
    docs = table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % bench_mod == bench_rem)
    corpus = docs.where(F.col("doc_id") % bench_mod != bench_rem)

    # 1. quality: keep verdicts from the shared rule set
    verdicts = quality_rules(corpus, "doc_id", "text")
    quality = corpus.join(
        verdicts.where(F.col("keep")).select("doc_id"), "doc_id"
    )

    # 2. exact dedup: min doc_id wins per content fingerprint — one
    # shuffle on the fingerprint, min_by avoids a ranking window
    deduped = (
        quality.select("doc_id", "source", "text", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min_by(F.struct("doc_id", "source", "text"), F.col("doc_id")).alias(
                "d"
            )
        )
        .select("d.doc_id", "d.source", "d.text", "fp")
    )

    # 3. decontamination: drop any doc sharing an n-gram with the
    # benchmark (broadcast bench shingles; anti-join keeps the rest)
    sh = F.explode(
        word_shingles(F.col("text"), DECONTAM_NGRAM)
    ).alias("shingle")
    bench_sh = bench.select(sh).distinct()
    hit_ids = (
        deduped.select("doc_id", sh)
        .join(F.broadcast(bench_sh), "shingle")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(hit_ids, "doc_id", "left_anti")

    # 4. split: content-hash buckets (fingerprint already computed)
    bucket = F.conv(F.substring("fp", 1, 8), 16, 10).cast("long") % 100
    split = clean.select(
        "doc_id",
        "source",
        "text",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )

    # 5. packing: budget partitioning via per-(split, source) prefix
    # sums — each shard packs independently, no global order
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    packed = split.select(
        "doc_id",
        "split",
        "source",
        n_tok.alias("n_tokens"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("seq_offset"),
    ).withColumn(
        "seq_id", (F.col("seq_offset") / F.lit(PACK_BUDGET)).cast("long")
    )

    funnel = (
        spark.createDataFrame(
            [
                ("0_input", corpus.count()),
                ("1_quality", quality.count()),
                ("2_exact_dedup", deduped.count()),
                ("3_decontaminated", clean.count()),
                ("4_split", split.count()),
                ("5_packed", packed.count()),
            ],
            "stage string, n_docs long",
        )
    )
    return {
        "quality": quality,
        "deduped": deduped,
        "clean": clean,
        "split": split,
        "packed": packed,
        "funnel": funnel,
    }
