"""Deduplication operators for training-data pipelines (north star):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design:
- Exact dedup: hash-groupBy on a content fingerprint — one shuffle on
  the 128-bit key, perfectly balanced.
- MinHash LSH: shingle → k minhashes → b bands; candidate pairs only
  form inside (band, band_hash) buckets, so the self-join is bucket-
  local — never an O(n²) cross join. At 100 TB tune (k, b) for the
  recall/bucket-size tradeoff and salt any pathological bucket.
- SimHash: 64-bit signature via per-token hash bit-voting; near-dups
  are signatures within small Hamming distance, found by pigeonhole
  banding (same idea as LSH bands).
- All hashing is xxhash64 (deterministic, seedable, JVM built-in).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens, word_shingles
from ..functions.vectors import dot, norm
from ..io import table

MINHASH_K = 16  # signature length
LSH_BANDS = 4  # bands of 4 rows each


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group documents by content fingerprint; emit one
    row per content group with the representative (min doc_id) and the
    duplicate count. groups with dup_count>1 are the removable mass."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """id + MinHash signature columns for a text column.

    Explode formulation: shingles are computed ONCE per document, then
    each (doc, shingle) row contributes k seeded hashes and a map-side
    partial MIN folds them before the shuffle — the wire carries only
    #docs × k longs. (A per-row `transform` per seed re-evaluates the
    shingle expression k times — measured 10× slower.)
    """
    # small-file scans arrive as ONE input partition; repartition before
    # the explode so shingling/hashing uses every core (docs are tiny
    # rows — the shuffle is negligible next to 32× parallelism)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(n_part).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col))).alias("shingle")
    )
    hashed = sh.select(
        id_col,
        *[
            F.xxhash64(F.concat(F.lit(f"{j}|"), F.col("shingle"))).alias(f"h_{j}")
            for j in range(MINHASH_K)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h_{j}").alias(f"mh_{j}") for j in range(MINHASH_K)]
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, jaccard_threshold: float = 0.5
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, verified with
    the exact signature-estimated Jaccard.

    Plan shape: signatures (narrow) → explode to b band rows → shuffle
    on (band, band_hash) → bucket-local self-join → estimate filter.
    """
    sigs = minhash_signatures(df, id_col, text_col)
    rows_per_band = MINHASH_K // LSH_BANDS
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh_{j}")
                                for j in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_hash")

    left = band_rows.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = band_rows.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    # dedupe candidate id-pairs FIRST — shuffling/distinct-ing bare id
    # pairs is far cheaper than dragging two k-long signature arrays
    # through the self-join; signatures re-attach via broadcast lookups
    pairs = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sig_arr = sigs.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{j}") for j in range(MINHASH_K)]).alias("sig"),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / MINHASH_K
    )
    return (
        pairs.join(
            F.broadcast(sig_arr.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))),
            "id_a",
        )
        .join(
            F.broadcast(sig_arr.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))),
            "id_b",
        )
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= jaccard_threshold)
    )


def minhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs over documents (rows-only
    correctness check: hash seeds are engine-specific, so no SQL twin —
    planted-duplicate unit tests assert recall instead)."""
    d = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", jaccard_threshold=0.5)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash: per-token xxhash64, each bit votes ±1 weighted by
    term frequency; signature bit b is 1 iff the vote sum is positive.

    Expressed with higher-order functions only — per-row, no shuffle.
    """
    # explode formulation (see minhash_signatures): one xxhash64 per
    # token, 64 conditional partial-aggregated SUMs — all codegen, one
    # shuffle of #docs × 64 ints. shiftleft keeps bit 63 JVM-side
    # (1 << 63 overflows a Python long literal).
    n_part = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(n_part)
        .select(
            F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
        )
        .select(id_col, F.xxhash64("tok").alias("h"))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b))
                    != 0,
                    1,
                ).otherwise(-1)
            ).alias(f"v_{b}")
            for b in range(64)
        ]
    )
    sig = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(
                F.col(f"v_{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole on 4 16-bit chunks (Hamming
    distance ≤3 guarantees ≥1 identical chunk), verify with exact
    popcount of the XOR. rows-only check (hash-seed-specific)."""
    d = table(spark, sf_dir, "documents")
    sigs = simhash_signatures(d, "doc_id", "text")
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.chunk_val")
    left = chunks.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"), "chunk", "chunk_val"
    )
    right = chunks.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"), "chunk", "chunk_val"
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        left.join(right, ["chunk", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 3)
        .distinct()
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, oracle-checkable.

    Inverted-index formulation: explode distinct shingles, self-join on
    shingle (pairs only materialize where they share one), count
    intersections, Jaccard = |∩| / (|A|+|B|-|∩|). Bounded to documents
    with doc_id < 1000 so the pair space stays small at every SF — the
    LSH variants above are the scale path.
    """
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    sh = d.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
    )


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, oracle-checkable at test SFs.

    Brute-force within a bounded id window (vec_id < 500) — the LSH
    bucketed variant in similarity.py is the 100 TB path. Threshold
    0.4 sits at ~p99.9 of the testdata's cosine distribution.
    """
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    # norms precomputed per ROW (not per pair), with a repartition
    # barrier so CollapseProject can't inline the fold back into the
    # pair stage — and so the nested-loop join parallelizes instead of
    # running in the scan's single input partition (measured 6×)
    n_part = spark.sparkContext.defaultParallelism
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        norm("embedding").alias("norm_a"),
    ).repartition(n_part)
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        norm("embedding").alias("norm_b"),
    ).repartition(n_part)
    cos = F.when(
        (F.col("norm_a") > 0) & (F.col("norm_b") > 0),
        dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= 0.4)
    )


def dedup_components(
    spark: SparkSession, sf_dir: str, rounds: int = 3
) -> DataFrame:
    """Near-dup clustering: connected components over the deterministic
    n-gram Jaccard pair graph — the step after pair generation that a
    training-data pipeline uses to keep ONE canonical doc per duplicate
    cluster (the cluster's min doc_id).

    Spark-first iterative min-label propagation, fully lazy: labels
    start as each doc's own id; each round every node takes the min
    label over itself and its direct neighbors. `rounds` bounds the
    reachable component diameter (observed testdata clusters are
    cliques, diameter 1; the oracle flags any violation rather than
    letting it pass silently).

    The edge list is materialized ONCE via localCheckpoint before the
    rounds — iterative algorithms must cut lineage, or every round
    re-evaluates the expensive pair-generation subtree (measured: 64
    document scans and 4× the runtime for 3 rounds; optimizer
    rewrites make the per-round subtrees non-identical, so
    ReusedExchange can't save it). At 100 TB the unroll becomes a
    convergence loop checkpointing labels each round, or alternating
    small-star/large-star (same join primitive, provably few rounds
    on skewed graphs).
    """
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint()
    )
    labels = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 1000)
        .select("doc_id")
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(rounds):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("_nb"),
                    F.col("component").alias("_nb_comp"),
                ),
                F.col("dst") == F.col("_nb"),
            )
            .groupBy("src")
            .agg(F.min("_nb_comp").alias("nbr_min"))
        )
        labels = labels.join(
            nbr.select(F.col("src").alias("_s"), "nbr_min"),
            F.col("doc_id") == F.col("_s"),
            "left",
        ).select(
            "doc_id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_min"), F.col("component")),
            ).alias("component"),
        )
    return labels


def levenshtein_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs — the character-level modality the
    shingle/hash families miss (transposed words, small in-place edits).

    Scale levers: a length-difference prefilter inside the join
    condition (|len_a − len_b| ≤ t is necessary for distance ≤ t) keeps
    most pairs from ever running the DP, and Spark's thresholded
    ``levenshtein(l, r, t)`` early-exits at O(len × t) instead of
    O(len²). Bounded to doc_id < 200 like the other exact-pair ops —
    LSH banding is the 100 TB candidate-generation path.
    """
    t = 25
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text", F.length("text").alias("ln"))
    )
    n_part = spark.sparkContext.defaultParallelism
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("ln").alias("ln_a"),
    ).repartition(n_part)
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("text_b"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(
            b,
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= t),
        )
        .withColumn("edit_dist", F.levenshtein("text_a", "text_b", t))
        .where(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )
