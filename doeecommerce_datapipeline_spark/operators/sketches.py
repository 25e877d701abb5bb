"""Count-min sketch: fixed-size frequency estimation as a pure
DataFrame composition (SURVEY extension — the "novel sketch" class the
built-in approx aggregates don't cover; approx_count_distinct/HLL and
percentile_approx live in analytics.py).

The sketch is D hash rows × W buckets of counters built in ONE
groupBy over a D-way posexplode — 4·1024 cells here regardless of key
cardinality, which is the entire point: at 100 TB the frequency table
for a billion-key column is unboundedly large, the CMS is 32 KB and
merges across partitions/days by cell-wise addition (it's just a SUM).
Point estimates take the MIN across each key's D cells and are
guaranteed overestimates (collisions only ever ADD mass), which the
unit test and the emitted `overestimate` column both pin.

Everything is integer arithmetic on universal-hash buckets
((a·u + b) mod P mod W with P = 2^31 − 1), expressible identically in
ANSI SQL — so unlike HLL sketches this one is fully oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

CMS_P = 2147483647  # 2^31 − 1, prime modulus of the universal hash
CMS_W = 1024  # buckets per hash row
# (a, b) per hash row: a < 2^21 keeps a·(u mod P) < 2^52 — exact in
# BIGINT (and even in a double-based engine) with no overflow
CMS_HASHES = [
    (1000003, 12345),
    (1000033, 67891),
    (1000037, 24680),
    (1000039, 13579),
]


def cms_bucket(key, a: int, b: int):
    """Universal-hash bucket of a non-negative integer key column."""
    u = key % F.lit(CMS_P)
    return ((F.lit(a) * u + F.lit(b)) % F.lit(CMS_P)) % F.lit(CMS_W)


def cms_build(df: DataFrame, key: str) -> DataFrame:
    """Build the (row_i, bucket, cnt) sketch table in one aggregate."""
    buckets = F.array(
        *[cms_bucket(F.col(key), a, b) for a, b in CMS_HASHES]
    )
    return (
        df.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most active users by exact count, with their count-min
    estimates: (user_id, true_count, cms_estimate, overestimate).

    The exact top-20 is a TakeOrderedAndProject over the per-user
    rollup (the verification side); the sketch side never sees key
    identities at all. Each candidate probes its D cells via a
    BROADCAST join against the 4096-row sketch; the estimate is the
    per-user MIN across rows. overestimate = estimate − truth ≥ 0
    always — the CMS guarantee, visible in the output.
    """
    e = table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(e, "user_id")
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("user_id"))
        .limit(20)
    )
    probes = top.select(
        "user_id",
        "true_count",
        F.posexplode(
            F.array(*[cms_bucket(F.col("user_id"), a, b) for a, b in CMS_HASHES])
        ).alias("row_i", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "user_id",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
        )
    )
