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
ANSI SQL — so the sketch is fully oracle-paired. The same trick now
also pairs the HyperLogLog below (hll_distinct_users): deterministic
integer mixing plus a string-domain bit-length for rho, no engine
hash and no log2 anywhere in the register path.
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


HLL_M = 64  # registers
HLL_ALPHA = 0.709  # alpha_64 constant from the HLL paper
HLL_MUL1 = 2654435761  # Knuth multiplicative step
HLL_MUL2 = 133371337  # second mixing multiply
HLL_MOD = 1 << 32  # hash domain
HLL_REST_BITS = 26  # 32 - log2(m) bits feed the rho count


def _hll_hash(u):
    """32-bit deterministic mix (multiply / xor-shift / multiply) in
    pure int64-safe arithmetic — every product stays below 2^63, so
    BOTH engines compute identical values with no wrap semantics.

    The first multiply is SPLIT into 16-bit halves: a naive
    (u % 2^32) * MUL1 overflows int64 once the key's low 32 bits
    exceed ~3.47e9 — fine on small test ids, an ANSI
    ARITHMETIC_OVERFLOW (or a silent non-ANSI wrap) on production
    64-bit snowflake-style ids. Caught by the r8 sf1 scale probe
    (keys offset by 10^9 per replica); the split keeps every product
    <= ~5.6e14. The h2 multiply is safe as-is (h1 < 2^32, MUL2 ~2^27
    -> product < 2^59)."""
    u32 = u % F.lit(HLL_MOD)
    hi = (u32 / F.lit(1 << 16)).cast("long")
    lo = u32 % F.lit(1 << 16)
    h1 = (
        ((hi * F.lit(HLL_MUL1)) % F.lit(HLL_MOD)) * F.lit(1 << 16)
        + lo * F.lit(HLL_MUL1)
    ) % F.lit(HLL_MOD)
    h2 = (
        h1.bitwiseXOR(F.shiftright(h1, 15)) * F.lit(HLL_MUL2)
    ) % F.lit(HLL_MOD)
    return h2.bitwiseXOR(F.shiftright(h2, 13))


def hll_registers(e: DataFrame, key_col: str = "user_id",
                  group_col: str = "event_type") -> DataFrame:
    """Sparse HLL register table (group, bucket, m_j) for a batch —
    the mergeable state unit: union of sketches = register-wise MAX,
    exactly, which is what the streaming foreachBatch folds on.
    Absent buckets mean register 0."""
    h = _hll_hash(F.col(key_col))
    hashed = e.select(
        F.col(group_col).alias("event_type"),
        (h % F.lit(HLL_M)).alias("bucket"),
        (h / F.lit(HLL_M)).cast("long").alias("rest"),
    )
    rho = F.when(
        F.col("mx_rest") == 0, F.lit(HLL_REST_BITS + 1)
    ).otherwise(
        F.lit(HLL_REST_BITS + 1)
        - F.length(F.conv(F.col("mx_rest").cast("string"), 10, 2))
    )
    # register value: max rho over the bucket corresponds to the
    # SMALLEST rest (rho is monotone decreasing in bit length), so one
    # MIN aggregate suffices
    return (
        hashed.groupBy("event_type", "bucket")
        .agg(F.min("rest").alias("mx_rest"))
        .select("event_type", "bucket", rho.alias("m_j"))
    )


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled HyperLogLog distinct-user estimate per event type,
    FULLY ORACLE-PAIRED — the cardinality companion of the CMS
    frequency sketch (whose module docstring used to call HLL the
    un-pairable one; deterministic integer mixing + string-domain
    bit-length makes it pairable after all). Emits the estimate
    beside the exact count so the output itself documents sketch
    error: (event_type, n_exact, hll_estimate, rel_error).

    Sketch shape: ONE groupBy over (type, bucket) — 64 registers per
    type regardless of user cardinality, mergeable by MAX, the whole
    point at 100 TB. rho (leading-zero run) comes from the BINARY
    STRING length of the 26 post-bucket bits (conv/bin on both
    engines — integer-exact, no log2). The closing estimate is
    alpha*m^2 / sum(2^-M_j) on exact dyadic register powers (order-
    free sums), with the standard small-range linear-counting switch;
    its ln() rounds at 9 dp (the engine-log seam). The exact
    countDistinct sits in a separate aggregate joined back — it is
    the VERIFICATION column, not part of the sketch path.
    """
    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    regs = hll_registers(e)
    # every (type, bucket) cell, absent buckets count as register 0
    types = e.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    full = spine.join(regs, ["event_type", "bucket"], "left").select(
        "event_type",
        F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j"),
    )
    acc = full.groupBy("event_type").agg(
        # 2^-m_j is an exact dyadic double; 64-term sum is exact under
        # any order (multiples of 2^-27 bounded by 64)
        F.sum(F.pow(F.lit(2.0), -F.col("m_j").cast("double"))).alias("z"),
        F.sum((F.col("m_j") == 0).cast("int")).alias("v"),
    )
    m = float(HLL_M)
    raw = F.lit(HLL_ALPHA) * F.lit(m * m) / F.col("z")
    linear = F.round(
        F.lit(m)
        * F.log(F.lit(m) / F.col("v").cast("double")),
        9,
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0), linear
    ).otherwise(F.round(raw, 9))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    out = exact.join(F.broadcast(acc.select("event_type", est.alias("hll_estimate"))), "event_type")
    return out.select(
        "event_type",
        "n_exact",
        "hll_estimate",
        (
            F.abs(F.col("hll_estimate") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_error"),
    )
