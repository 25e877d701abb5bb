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
