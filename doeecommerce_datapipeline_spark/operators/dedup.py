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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint, tokens, word_shingles
from ..functions.vectors import cosine
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


def _seeded_minhash(shingle_col: Column, j: int) -> Column:
    """min over shingles of xxhash64(seed_j ‖ s).

    NB: the lambda must take exactly one parameter — PySpark's
    higher-order functions dispatch on lambda arity (a second parameter
    would receive the array index, not a closure value).
    """
    prefix = F.lit(f"{j}|")
    return F.array_min(
        F.transform(shingle_col, lambda s: F.xxhash64(F.concat(prefix, s)))
    )


def _minhash_signature(shingle_col: Column) -> list[Column]:
    """k independent minhashes."""
    return [
        _seeded_minhash(shingle_col, j).alias(f"mh_{j}")
        for j in range(MINHASH_K)
    ]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """id + MinHash signature columns for a text column."""
    return df.select(
        F.col(id_col), *_minhash_signature(word_shingles(F.col(text_col)))
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
        F.array(*[F.col(f"mh_{j}") for j in range(MINHASH_K)]).alias("sig"),
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
    ).select(id_col, "sig", "bk.band", "bk.band_hash")

    left = band_rows.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_hash"
    )
    right = band_rows.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_hash"
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
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
    return pairs.select(
        "id_a", "id_b", est.alias("est_jaccard")
    ).where(F.col("est_jaccard") >= jaccard_threshold)


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
    tok_hashes = F.transform(
        tokens(F.lower(F.col(text_col))), lambda t: F.xxhash64(t)
    )

    def _bit_vote(b: int) -> Column:
        # single-arity lambdas only (see _seeded_minhash); shiftleft
        # keeps bit 63 JVM-side (1 << 63 overflows a Python long lit)
        mask = F.shiftleft(F.lit(1).cast("long"), b)
        return F.aggregate(
            tok_hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bit_votes = [_bit_vote(b) for b in range(64)]
    sig = reduce(
        lambda acc, bv_b: acc.bitwiseOR(
            F.when(
                bv_b[0] > 0, F.shiftleft(F.lit(1).cast("long"), bv_b[1])
            ).otherwise(F.lit(0).cast("long"))
        ),
        zip(bit_votes, range(64)),
        F.lit(0).cast("long"),
    )
    return df.select(F.col(id_col), sig.alias("simhash"))


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
    sh = d.select(
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
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("emb_a", "emb_b").alias("cos"))
        .where(F.col("cos") >= 0.4)
    )
