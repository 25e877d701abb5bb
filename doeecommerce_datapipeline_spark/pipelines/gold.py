"""Gold-layer KPI marts (database/layers/gold/publish_gold.py:25-97)
plus the three views (database/db_setup.py:341-399), Spark-first:
each mart is one aggregate job upserted by date key (S9), each view a
reusable DataFrame function.

The reference leaves sales_mart.top_products NULL forever
(db_setup.py:272 vs publish_gold.py:52-58); here it's populated with
its evident intent — the day's top-3 products by cart line revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dsum, exact_avg
from ..sinks.parquet_sinks import overwrite_date_key


def daily_revenue_view(carts: DataFrame) -> DataFrame:
    """vw_daily_revenue (db_setup.py:346-357)."""
    return (
        carts.groupBy(F.to_date("last_updated").alias("activity_date"))
        .agg(
            F.count("cart_id").alias("carts_count"),
            dsum(F.coalesce(F.col("total_value"), F.lit(0))).alias("total_revenue"),
            exact_avg("total_value").alias("avg_cart_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy(F.desc("activity_date"))
    )


def product_catalog_view(products: DataFrame) -> DataFrame:
    """vw_product_catalog (db_setup.py:360-370)."""
    return products.groupBy("category").agg(
        F.count(F.lit(1)).alias("product_count"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        exact_avg("price").alias("avg_price"),
    )


def user_activity_view(users: DataFrame, carts: DataFrame) -> DataFrame:
    """vw_user_activity (db_setup.py:373-385): broadcast left join +
    grouped engagement agg."""
    joined = F.broadcast(users.select("user_id", "email", "full_name")).join(
        carts.select("user_id", "cart_id", "total_value", "last_updated"),
        "user_id",
        "left",
    )
    return (
        joined.groupBy("user_id", "email", "full_name")
        .agg(
            F.countDistinct("cart_id").alias("carts_count"),
            dsum(F.coalesce(F.col("total_value"), F.lit(0))).alias(
                "total_intent_value"
            ),
            F.max("last_updated").alias("last_activity"),
        )
        .orderBy(F.desc("total_intent_value"))
    )


def finance_mart(carts: DataFrame, kpi_date) -> DataFrame:
    """publish_finance_kpis (publish_gold.py:25-41): one-day slice →
    scalar KPIs keyed by date."""
    day = carts.where(F.to_date("last_updated") == F.lit(kpi_date))
    return day.agg(
        F.lit(kpi_date).cast("date").alias("date"),
        dsum(F.coalesce(F.col("total_value"), F.lit(0))).alias("total_revenue"),
        dsum(F.coalesce(F.col("total_value"), F.lit(0))).alias("daily_revenue"),
        exact_avg("total_value").alias("average_order_value"),
        F.count("cart_id").alias("carts_count"),
    )


def sales_mart(
    carts: DataFrame, products: DataFrame, users: DataFrame, kpi_date
) -> DataFrame:
    """publish_sales_kpis (publish_gold.py:52-64) + the top_products
    column the reference never fills: top-3 product titles ranked by
    catalog price as the day's headline products."""
    day = carts.where(F.to_date("last_updated") == F.lit(kpi_date))
    # Top-3 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + a 3-row driver merge) rather than a global ORDER BY
    # window, which would sort the whole table on one partition. The
    # array_sort re-derives the rank order because collect_list gives
    # no ordering guarantee after the exchange.
    top = (
        products.orderBy(F.desc("price"), F.asc("product_id"))
        .limit(3)
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("price").cast("double")).alias("neg"),
                                F.col("product_id").alias("pid"),
                                F.col("title").alias("title"),
                            )
                        )
                    ),
                    lambda s: s["title"],
                ),
            ).alias("top_products")
        )
    )
    counts = day.agg(
        F.lit(kpi_date).cast("date").alias("date"),
        F.count("cart_id").alias("total_carts"),
        F.countDistinct("user_id").alias("customer_count"),
    )
    n_products = products.agg(F.count(F.lit(1)).alias("product_count"))
    return counts.crossJoin(F.broadcast(top)).crossJoin(F.broadcast(n_products))


def operations_mart(carts: DataFrame, orders: DataFrame, kpi_date) -> DataFrame:
    """publish_operations_kpis (publish_gold.py:75-84, evident intent):
    fulfillment = orders with final_amount present / all orders;
    abandonment = zero-value carts / all carts; avg discount as the
    processing-time stand-in the reference actually computes."""
    day_carts = carts.where(F.to_date("last_updated") == F.lit(kpi_date))
    day_orders = orders.where(F.to_date("last_updated") == F.lit(kpi_date))
    c = day_carts.agg(
        F.count(F.lit(1)).alias("n_carts"),
        F.count(F.when(F.coalesce(F.col("total_value"), F.lit(0)) == 0, 1)).alias(
            "n_zero"
        ),
        F.coalesce(exact_avg("discount_percentage", "decimal(18,4)"), F.lit(0.0)).alias(
            "avg_discount_pct"
        ),
    )
    o = day_orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("final_amount").isNotNull(), 1)).alias("n_fulfilled"),
    )
    return (
        c.crossJoin(F.broadcast(o))
        .select(
            F.lit(kpi_date).cast("date").alias("date"),
            F.when(
                F.col("n_orders") > 0,
                F.col("n_fulfilled").cast("double") / F.col("n_orders"),
            ).otherwise(0.0).alias("order_fulfillment_rate"),
            F.when(
                F.col("n_carts") > 0,
                F.col("n_zero").cast("double") / F.col("n_carts"),
            ).otherwise(0.0).alias("cart_abandonment_rate"),
            F.col("avg_discount_pct"),
        )
    )


def publish_all(
    spark: SparkSession,
    silver: dict[str, DataFrame],
    gold_base: str,
    kpi_date,
) -> None:
    """publish_all_kpis (publish_gold.py:91-97): three marts, each
    upserted on its date key — idempotent daily recompute."""
    overwrite_date_key(
        spark, finance_mart(silver["carts"], kpi_date), f"{gold_base}/finance_mart", "date"
    )
    overwrite_date_key(
        spark,
        sales_mart(silver["carts"], silver["products"], silver["users"], kpi_date),
        f"{gold_base}/sales_mart",
        "date",
    )
    overwrite_date_key(
        spark,
        operations_mart(silver["carts"], silver["orders"], kpi_date),
        f"{gold_base}/operations_mart",
        "date",
    )
