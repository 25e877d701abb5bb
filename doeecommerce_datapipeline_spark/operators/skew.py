"""Skew-handling utilities for hot keys (SURVEY.md §4 / 100 TB notes).

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py). These
helpers cover the two patterns AQE can't fix:

- salted_aggregate: a grouped agg where one key holds a large fraction
  of all rows — partial-aggregate under (key, salt), then re-aggregate
  by key. Two small shuffles instead of one hot reducer.
- salted_broadcast_left: a join where the BUILD side is small but the
  probe side's hot key overwhelms a task even post-AQE — replicate the
  broadcast side across salts. (For two large sides, prefer AQE.)

Both are semantics-preserving for associative aggregates (SUM/COUNT/
MIN/MAX — decimal sums stay exact and order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregate: (keys, salt) → keys.

    aggs: output_name -> (input_col, fn) with fn ∈ {sum, count, min, max}.
    SUMs cast to decimal for exact re-aggregation.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1.append(F.sum(F.col(col).cast("decimal(28,6)")).alias(out))
        elif fn == "count":
            phase1.append(F.count(F.col(col)).alias(out))
        elif fn == "min":
            phase1.append(F.min(col).alias(out))
        elif fn == "max":
            phase1.append(F.max(col).alias(out))
        else:
            raise ValueError(f"non-reaggregatable fn: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*phase1)
    phase2 = []
    for out, (_, fn) in aggs.items():
        if fn in ("sum", "count"):
            phase2.append(F.sum(out).alias(out))
        elif fn == "min":
            phase2.append(F.min(out).alias(out))
        else:
            phase2.append(F.max(out).alias(out))
    return partial.groupBy(*keys).agg(*phase2)


def detect_hot_keys(
    df: DataFrame, key: str, threshold_frac: float = 0.05, sample_frac: float = 0.1
) -> list:
    """Sampled hot-key probe: keys holding > ``threshold_frac`` of a
    ``sample_frac`` sample. One cheap job over the sample; the result
    is a tiny driver-side list (there can be at most 1/threshold_frac
    such keys), which the splitter broadcasts via ``isin``."""
    sample = df.sample(fraction=sample_frac, seed=42)
    n = sample.count()
    if n == 0:
        return []
    rows = (
        sample.groupBy(key)
        .count()
        .where(F.col("count") > threshold_frac * n)
        .select(key)
        .collect()
    )
    return [r[key] for r in rows]


def salted_shuffle_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Inner join of TWO LARGE sides where the probe side has hot keys
    — the profile AQE's skew-join split cannot fully fix: AQE splits an
    oversized SKEWED partition into chunks but must then replicate the
    matching build partition per chunk, and when the build side's hot
    key rows are themselves large, or the join followed a
    user-repartition AQE won't touch, the hot reducer survives.

    Shape: split-and-salt. Hot-key rows on the skewed side get a
    random salt in [0, n_salts); the other side's hot-key rows are
    replicated once per salt (only the HOT slice is replicated — the
    cost is n_salts × |other ∩ hot|, not n_salts × |other|). Both
    branches are plain shuffle joins (sort-merge at size); their union
    is exactly the unsalted join. Neither side is broadcast — this is
    the big⋈big pattern; for a small build side use
    ``salted_broadcast_left``.

    Semantics-preserving for INNER joins on any data: salting only
    refines the partitioning of identical-key pairs, it never drops or
    duplicates a match (each skewed row carries ONE salt; each other-
    side hot row appears once PER salt, so every (skewed, other) pair
    meets exactly once).
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(skewed, key)
    if not hot_keys:
        return skewed.join(other, key)
    is_hot = F.col(key).isin(hot_keys)
    cold = skewed.where(~is_hot).join(other.where(~is_hot), key)
    hot_s = skewed.where(is_hot).withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    hot_o = other.where(is_hot).withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    hot = hot_s.join(hot_o, [key, "_salt"]).drop("_salt")
    return cold.unionByName(hot)


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """big ⋈ small on `key` with the big side salted and the small side
    replicated n_salts× — every hot-key row lands in a different task.
    Returns the joined frame (small's columns appended)."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(F.broadcast(small_r), [key, "_salt"]).drop("_salt")


def key_skew_profile(spark, sf_dir: str) -> DataFrame:
    """Pre-flight skew diagnosis for a join/groupBy key: one row of
    per-key-frequency distribution stats for events.user_id —
    (n_keys, n_rows, hot_key, max_cnt, p50_cnt, p90_cnt, p99_cnt,
    skew_ratio). skew_ratio = max_cnt / mean_cnt is the number that
    decides between the plain plan, AQE skew splitting, and the
    salted operators above (rule of thumb: > ~20 on a shuffle key
    means the hot task dominates the stage).

    One fact shuffle to the per-key rollup; the percentile aggregate
    and the top-1 probe (TakeOrderedAndProject with a key tiebreak)
    both run over the keys-sized rollup, then broadcast-join into a
    single row. skew_ratio multiplies exact bigints before ONE double
    division; percentiles round to 4 dp at the interpolation seam.
    """
    from ..io import table

    counts = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.percentile("cnt", F.lit(0.5)), 4).alias("p50_cnt"),
        F.round(F.percentile("cnt", F.lit(0.9)), 4).alias("p90_cnt"),
        F.round(F.percentile("cnt", F.lit(0.99)), 4).alias("p99_cnt"),
    )
    hot = (
        counts.orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(1)
        .select(F.col("user_id").alias("hot_key"))
    )
    return stats.crossJoin(F.broadcast(hot)).select(
        "n_keys",
        "n_rows",
        "hot_key",
        "max_cnt",
        "p50_cnt",
        "p90_cnt",
        "p99_cnt",
        (
            (F.col("max_cnt") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_ratio"),
    )
