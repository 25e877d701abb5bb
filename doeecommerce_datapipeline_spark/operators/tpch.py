"""Classic OLAP query shapes (TPC-H-style) over the testdata star
schema — the canonical scan-join-agg-topk patterns an analytics engine
must plan well. Complements the reference-parity queries with the
shapes SURVEY.md §7.2's bench hardening calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import (
    dec_sum,
    disc_rev_m,
    disc_rev_sum,
    dsum,
    lattice_2dp,
    lattice_split_sum,
    money_lattice_avg,
    money_lattice_dsum,
    money_lattice_sum,
)
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
            lattice_split_sum(
                lattice_2dp("l_extendedprice") * lattice_2dp("l_discount"),
                4,
                "decimal(38,6)",
            )
            .cast("double")
            .alias("revenue"),
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
            disc_rev_sum().cast("double").alias("revenue")
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
        money_lattice_avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(per_part), l.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            money_lattice_dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: trade volume between a nation pair, by shipping year.

    The scale move: resolve both nation filters onto the small dims
    FIRST, so the broadcast joins against supplier and customer prune
    lineitem/orders before the one big orderkey shuffle. Filtering
    after a 6-way join (the naive SQL shape) would shuffle the whole
    fact table; this plan shuffles only the two nations' traffic.
    """
    nation_a, nation_b = "NATION_1", "NATION_2"
    n = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(nation_a, nation_b)
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            disc_rev_sum().cast("double").alias("revenue")
        )
    )


def best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated min/max subquery — for each filtered part,
    the richest supplier that has ever shipped it (ties broken by the
    lowest suppkey, so the answer is total-ordered and deterministic).

    Spark-first: instead of decorrelating into a window rank over the
    distinct part↔supplier pairs (two shuffles: distinct + window), one
    ``max_by`` aggregation over a lexicographic struct key picks the
    winner in a single shuffle with map-side partial agg — duplicate
    pairs never need a separate dedup pass. (The struct agg buffer
    makes this a SortAggregate, not hash — still partial+final, and
    strictly less data movement than distinct-then-rank.)
    """
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("blue"))
        .select("p_partkey", "p_name")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("supp_nation"))
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = pairs.groupBy("p_partkey", "p_name").agg(
        F.max_by(
            F.struct("s_suppkey", "s_name", "s_acctbal", "supp_nation"),
            F.struct(F.col("s_acctbal"), -F.col("s_suppkey")),
        ).alias("best")
    )
    return best.select(
        "p_partkey",
        "p_name",
        F.col("best.s_suppkey").alias("s_suppkey"),
        F.col("best.s_name").alias("s_name"),
        F.col("best.s_acctbal").alias("s_acctbal"),
        F.col("best.supp_nation").alias("supp_nation"),
    )


def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN-subquery chain — suppliers whose shipped
    quantity of 'small *' parts exceeds 1.5× the average per-supplier
    quantity of those parts.

    Part filter → broadcast LEFT SEMI prunes the fact scan. The
    relative threshold (a scalar aggregate OF the aggregate) is a
    global window over the per-supplier rows rather than a separate
    agg + crossJoin: the naive two-branch plan re-evaluates the whole
    semi-join + agg subtree (Spark has no automatic CTE reuse), i.e.
    scans lineitem twice. The empty-partition window touches only the
    already-aggregated |suppliers| rows — one fact scan total.
    Quantities sum as exact decimals; the 1.5× compare happens on
    identically-derived doubles in both engines.
    """
    sp = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    shipped = table(spark, sf_dir, "lineitem").join(
        F.broadcast(sp), F.col("l_partkey") == F.col("p_partkey"), "leftsemi"
    )
    per_supp = shipped.groupBy("l_suppkey").agg(
        money_lattice_sum("l_quantity").alias("qty_dec")
    )
    w_all = Window.partitionBy()
    per_supp = per_supp.withColumn(
        "avg_qty",
        F.sum("qty_dec").over(w_all).cast("double")
        / F.count(F.lit(1)).over(w_all),
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    return (
        per_supp.where(F.col("qty_dec").cast("double") > 1.5 * F.col("avg_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "supp_nation",
            F.col("qty_dec").cast("double").alias("total_qty"),
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
        .agg(money_lattice_dsum("l_quantity").alias("total_qty"))
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


def last_shipper_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: double-correlated EXISTS / NOT EXISTS — in orders
    served by several suppliers, which supplier shipped strictly last?
    (EXISTS another supplier in the order; NOT EXISTS one shipping
    later; shipdate ties disqualify the order, keeping the winner
    unique and deterministic.)

    Spark-first decorrelation: pre-aggregate to one row per
    (order, supplier), then three unordered window aggregates over the
    orderkey partitioning replace both correlated subqueries — the
    fact table shuffles once on (orderkey, suppkey) and once on
    orderkey, never self-joins.
    """
    l = table(spark, sf_dir, "lineitem")
    per = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    w_o = Window.partitionBy("l_orderkey")
    w_om = Window.partitionBy("l_orderkey", "s_max")
    marked = per.select(
        "l_orderkey",
        "l_suppkey",
        "s_max",
        F.count(F.lit(1)).over(w_o).alias("n_supp"),
        F.max("s_max").over(w_o).alias("top1"),
        F.count(F.lit(1)).over(w_om).alias("cnt_at_max"),
    )
    winners = marked.where(
        (F.col("n_supp") > 1)
        & (F.col("s_max") == F.col("top1"))
        & (F.col("cnt_at_max") == 1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("orders_won"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "orders_won")
    )


def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of orders-per-customer INCLUDING the
    zero bucket — a left outer join into two stacked aggregations.

    The outer join is what makes it Q13: an inner join would silently
    drop never-ordered customers, and the 0-orders bucket is usually
    the business-interesting one. First agg keys on custkey (big),
    second on the count (tiny) — the second shuffle moves almost
    nothing.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per part attribute group, with a
    NOT-IN supplier exclusion — the anti-join + count-distinct combo.

    The excluded-supplier set is an aggregate-free dimension filter:
    broadcast LEFT ANTI against the (partkey, suppkey) pairs before
    the group-by, so excluded rows never enter the shuffle.
    """
    p = table(spark, sf_dir, "part").where(F.col("p_size").isin(1, 5, 9, 13))
    excluded = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "leftanti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders,
    rolled up by market segment — scalar subquery threshold + anti-join.

    The global average broadcasts as a one-row crossJoin onto the
    dimension scan; NOT EXISTS is a left-anti join against only the
    custkey column of orders. Averages divide an exact decimal sum by
    the count, so the > threshold compare is engine-independent.
    """
    c = table(spark, sf_dir, "customer")
    avg_bal = c.agg(
        (
            money_lattice_avg("c_acctbal")
        ).alias("ab")
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_lattice_dsum("c_acctbal").alias("total_bal"),
        )
    )


def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS correlated subquery → LEFT SEMI join. Orders
    (in one quarter) having at least one line shipped more than 30
    days after the order date, counted by priority.

    The semi join keeps order rows at most once however many lines
    match, and the date-window filter prunes the orders scan before
    the join. The ship-lag predicate lives in the join condition, so
    only matching (orderkey) pairs survive the shuffle.
    """
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate").cast("date")
                > F.date_add(F.col("o_orderdate").cast("date"), 30)
            ),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top 20. The
    returnflag filter reaches the lineitem scan as a pushed predicate;
    customer+nation broadcast onto the aggregated (not raw) rows; the
    top-k is TakeOrderedAndProject with a unique tiebreaker.
    """
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            disc_rev_sum().cast("double").alias("lost_revenue")
        )
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"))
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "nation", "lost_revenue")
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-sum ratio — the percentage of one month's
    revenue coming from 'small *' parts. Both sums accumulate as exact
    decimals in ONE aggregate pass (the promo arm is a CASE inside the
    sum, not a second scan); the only float op is the final division
    of two exactly-reproducible doubles.
    """
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_name").startswith("small").alias("is_promo")
    )
    m = disc_rev_m()
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            lattice_split_sum(
                F.when(F.col("is_promo"), m).otherwise(F.lit(0).cast("long")),
                4,
                "decimal(38,6)",
            ).alias("_promo"),
            lattice_split_sum(m, 4, "decimal(38,6)").alias("_total"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_total").cast("double")
            ).alias("promo_pct"),
            F.col("_promo").cast("double").alias("promo_revenue"),
            F.col("_total").cast("double").alias("total_revenue"),
        )
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's customer revenue, by
    order year — a conditional-sum ratio per group.

    Both the numerator (CASE on supplier nation) and denominator
    accumulate as exact decimals in the SAME aggregate pass; the share
    is one double division per year row. Region/nation filters resolve
    onto the dims before their broadcasts, so the fact joins carry a
    single boolean instead of nation strings.
    """
    region = "REGION_1"
    nation = "NATION_5"
    n_reg = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").where(F.col("r_name") == region)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n_reg), F.col("c_nationkey") == F.col("n_nationkey"), "leftsemi")
        .select("c_custkey")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("sn_key"), "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", (F.col("n_name") == nation).alias("is_target"))
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    m = disc_rev_m()
    joined = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            lattice_split_sum(
                F.when(F.col("is_target"), m).otherwise(F.lit(0).cast("long")),
                4,
                "decimal(38,6)",
            ).alias("_t"),
            lattice_split_sum(m, 4, "decimal(38,6)").alias("_all"),
        )
        .select(
            "o_year",
            (F.col("_t").cast("double") / F.col("_all").cast("double")).alias("mkt_share"),
            F.col("_all").cast("double").alias("region_revenue"),
        )
    )


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year. The reference
    schema has no partsupp, so part retail price stands in for supply
    cost: profit = revenue − retailprice × quantity, both arms exact
    decimals folded in one aggregate.

    The part filter ('%rod%', Q9's LIKE on p_name) prunes via the
    broadcast inner join before the orderkey shuffle.
    """
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").contains("rod"))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # profit rides the 1e-4 lattice: both arms are products of 2-dp
    # values, so m = c·(100−d) − r·q is exact int64 (|m| ≤ 1.05e9)
    profit_m = disc_rev_m() - lattice_2dp("p_retailprice") * lattice_2dp(
        "l_quantity"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            lattice_split_sum(profit_m, 4, "decimal(38,6)")
            .cast("double")
            .alias("profit")
        )
    )


def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way star join where customer and supplier must share
    a nation (the extra c_nationkey = s_nationkey equi-condition), date
    + region filters, revenue by nation. Dimensions resolve before
    broadcast; the only big shuffle is lineitem⋈orders."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "REGION_1")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            disc_rev_sum().cast("double").alias("revenue")
        )
    )


def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value vs a scalar-subquery threshold over
    the SAME aggregate (group sum > fraction × global sum). One scan
    feeds both aggregates; the single-row global total broadcasts onto
    the per-part rollup (never a shuffle)."""
    l = table(spark, sf_dir, "lineitem")
    value_m = lattice_2dp("l_extendedprice") * lattice_2dp("l_quantity")
    per_part = l.groupBy("l_partkey").agg(
        lattice_split_sum(value_m, 4, "decimal(38,6)")
        .cast("double")
        .alias("part_value")
    )
    total = l.agg(
        lattice_split_sum(value_m, 4, "decimal(38,6)")
        .cast("double")
        .alias("_total")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("_total") * 0.001)
        .select("l_partkey", "part_value")
    )


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: windowed revenue rollup per supplier, then the
    supplier(s) hitting the MAX via a scalar subquery — equality on
    bit-identical decimal-sourced doubles, so ties resolve the same on
    every engine."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    per_supp = l.groupBy("l_suppkey").agg(
        disc_rev_sum().cast("double").alias("total_revenue")
    )
    best = per_supp.agg(F.max("total_revenue").alias("_best"))
    s = table(spark, sf_dir, "supplier")
    return (
        per_supp.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("_best"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brackets spanning both
    join sides (brand/size on part × quantity on lineitem). The shared
    p_partkey equi-join broadcasts part; the OR-of-ANDs residual
    filters after the join — Catalyst still pushes the per-side
    implied predicates (size ranges, quantity bounds) into the scans."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(bracket).agg(
        disc_rev_sum().cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers-who-kept-waiting) on this schema's dates:
    in orders with ≥ 2 distinct suppliers, find the supplier who was
    the ONLY one to ship late (> 30 days after the order date) — the
    one the delay can be blamed on — and count blamed orders per
    supplier. Returns the top 20 (s_suppkey, s_name, numwait).

    The reference Q21 is EXISTS + NOT EXISTS correlated subqueries;
    the scale-safe Spark shape collapses both into ONE orderkey
    aggregate + window pass: per-(order, supplier) lateness flags,
    then n_suppliers / n_late counted over the order — `late ∧
    n_supp > 1 ∧ n_late = 1` is exactly "this supplier late, no
    other late, some other exists". The (okey, suppkey) aggregate and
    the okey window share partitioning by the subset rule — one fact
    shuffle end to end; the supplier dim broadcasts onto the
    blamed-order survivors.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate").cast("date")
                    > F.date_add(F.col("o_orderdate").cast("date"), 30)
                ).cast("int")
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    blamed = flagged.where(
        (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full N×N international trade-flow matrix: revenue between every
    (customer nation, supplier nation) pair, with each row's share of
    the customer nation's import total — volume_shipping (Q7) answers
    this for ONE nation pair; the matrix is the macro view an
    economist or tariff model actually consumes. Columns: cust_nation,
    supp_nation, n_items, revenue, row_share.

    Shape: the fact joins orders (orderkey) once; customer/supplier/
    nation dimensions BROADCAST; one (cust_nation, supp_nation)
    aggregate — 625 cells max regardless of fact size; the row
    normalizer is a 25-row window. Revenue is the exact decimal sum
    surfaced as DOUBLE; row_share one division.

    Reference analog: generalizes the Q7 shape (SURVEY §2 volume
    shipping) from a filtered pair to the complete matrix.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    sn = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            disc_rev_sum().alias("rev"),
        )
    )
    wrow = Window.partitionBy("cust_nation")
    return flows.select(
        "cust_nation",
        "supp_nation",
        "n_items",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wrow).cast("double"),
            6,
        ).alias("row_share"),
    ).orderBy("cust_nation", "supp_nation")
