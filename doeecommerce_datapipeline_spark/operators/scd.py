"""Slowly-changing-dimension builders (warehouse-layer extension).

The reference's silver layer keeps only the latest row per key
(transform_silver.py latest-wins dedup); a real e-commerce warehouse
usually also needs the HISTORY — SCD Type 2 validity intervals
(effective_from / effective_to / is_current) so facts can join the
dimension AS OF their own date.

Spark-native shape (gaps-and-islands, ONE shuffle on the key):

1. lag() over (key ORDER BY total-order) marks rows where the tracked
   attribute changed;
2. a running SUM of the change flags over the same window numbers the
   islands (consecutive runs of one attribute value);
3. groupBy(key, island) — HashPartitioning(key) already satisfies the
   clustered distribution for (key, island), so no second shuffle;
4. lead(effective_from) over (key ORDER BY island) closes each
   interval; the last island per key stays open (is_current).

Every window carries a unique tiebreaker so island numbering is a
total order — deterministic under any partitioning (SURVEY §7.4
risk 3 discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table


def scd2(
    df: DataFrame,
    key: str,
    attr: str,
    order: list[Column],
    event_date: Column,
) -> DataFrame:
    """Collapse a per-key change stream into SCD Type 2 intervals.

    ``order`` must be a deterministic total order within ``key``;
    ``event_date`` is the column surfaced as the interval boundary.
    Returns (key, attr, effective_from, effective_to, is_current,
    n_rows) — effective_to is NULL on the open (current) interval.
    """
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(attr)).over(w)
    changed = (prev.isNull() | (prev != F.col(attr))).cast("long")
    islands = (
        df.withColumn("_chg", changed)
        .withColumn(
            "_island",
            F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_d", event_date)
    )
    grp = islands.groupBy(key, "_island", attr).agg(
        F.min("_d").alias("effective_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_isl = Window.partitionBy(key).orderBy("_island")
    nxt = F.lead("effective_from").over(w_isl)
    return grp.select(
        key,
        attr,
        "effective_from",
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
        "n_rows",
    )


def asof_enrich(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_date: Column,
    prefix: str = "regime_",
) -> DataFrame:
    """Join facts to the SCD2 interval covering their own date — the
    AS OF lookup that Type 2 history exists for. Equi-join on the key
    with the interval containment as a residual condition (half-open
    [from, to): a same-grain attribute flip yields an empty interval
    that can never match, so every fact matches EXACTLY one interval).
    One shuffle per side on the key; interval sets per key are tiny, so
    the residual filter is cheap post-hash-join work."""
    d = dim.select(
        F.col(key).alias("_k"),
        F.col("effective_from").alias(f"{prefix}from"),
        F.col("effective_to").alias(f"{prefix}to"),
        F.col("is_current").alias(f"{prefix}is_current"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in dim.columns
            if c not in (key, "effective_from", "effective_to", "is_current")
        ],
    )
    cond = (
        (fact[key] == d["_k"])
        & (fact_date >= d[f"{prefix}from"])
        & (d[f"{prefix}to"].isNull() | (fact_date < d[f"{prefix}to"]))
    )
    return fact.join(d, cond).drop("_k")


def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over orders: each customer's order-priority regime as
    validity intervals — consecutive same-priority orders collapse into
    one row, a priority switch closes the interval at the next order's
    date. (o_orderdate, o_orderkey) is the unique total order."""
    o = table(spark, sf_dir, "orders")
    out = scd2(
        o.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"),
        key="o_custkey",
        attr="o_orderpriority",
        order=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        event_date=F.to_date("o_orderdate"),
    )
    return out.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderpriority").alias("priority"),
        "effective_from",
        "effective_to",
        "is_current",
        "n_rows",
    )


def orders_asof_priority_regime(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every order annotated with the priority REGIME active at its
    date (the AS OF join against the SCD2 dimension) — exactly one
    regime row per order by the half-open-interval invariant.
    ``switched_within_regime`` flags orders whose own priority differs
    from the regime's (only possible when a same-day flip collapsed
    their island to an empty interval)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("customer_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("own_priority"),
    )
    dim = scd2_customer_priority(spark, sf_dir).select(
        "customer_id", "priority", "effective_from", "effective_to", "is_current"
    )
    out = asof_enrich(
        o, dim, key="customer_id", fact_date=F.col("order_date")
    )
    return out.select(
        "o_orderkey",
        "customer_id",
        "order_date",
        "own_priority",
        F.col("regime_priority"),
        F.col("regime_from"),
        F.col("regime_is_current"),
        (F.col("own_priority") != F.col("regime_priority")).alias(
            "switched_within_regime"
        ),
    )
