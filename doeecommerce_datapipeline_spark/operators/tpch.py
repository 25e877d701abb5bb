"""Classic OLAP query shapes (TPC-H-style) over the testdata star
schema — the canonical scan-join-agg-topk patterns an analytics engine
must plan well. Complements the reference-parity queries with the
shapes SURVEY.md §7.2's bench hardening calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dsum
from ..io import table


def simple_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: tight-filter scan → single scalar aggregate. The whole
    query should collapse into one codegen'd scan stage with every
    predicate pushed to parquet."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * F.col("l_discount"), "decimal(28,6)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: 3-way join, filtered both sides, grouped revenue,
    top-10. customer is broadcast; lineitem⋈orders shuffles on the
    orderkey; TakeOrderedAndProject caps the output."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "decimal(28,6)",
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery — lineitems whose quantity
    is below 20% of their part's average. Expressed as a self-agg join
    (what Catalyst's decorrelation produces anyway): per-part avg is a
    small aggregate, broadcast back onto the fact scan."""
    l = table(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(per_part), l.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a big aggregation, then dimension join.
    The having-filter runs on the aggregated (small) side before the
    broadcast join — never the other way around."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")), o.o_custkey == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("order_price"),
            "total_qty",
        )
    )
