"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives each one
its DuckDB-runnable ANSI-SQL twin.

Determinism contract (see functions/scalars.py): money aggregates are
exact decimal sums surfaced as DOUBLE; averages are double(decimal_sum)
/ count — bit-identical across engines and row orders. Every window
carries a unique tiebreaker. Counts are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from doeecommerce_datapipeline_spark.operators import (
    aggregates as A,
    joins as J,
    projections as P,
    windows as W,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return A.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # §2.4 aggregations
        "pricing_summary": A.pricing_summary,
        "daily_revenue": A.daily_revenue,
        "category_profile": A.category_profile,
        "finance_kpis": A.finance_kpis,
        "duplicate_check": A.duplicate_check,
        "null_counts": A.null_counts,
        "value_counts_topk": A.value_counts_topk,
        "summary_stats": A.summary_stats,
        "count_by_day": A.count_by_day,
        # §2.5 windows / dedup
        "dedup_latest_event": W.dedup_latest_event,
        "dedup_first_event": W.dedup_first_event,
        "distinct_projection": W.distinct_projection,
        "top_products_daily": W.top_products_daily,
        "running_totals": W.running_totals,
        # §2.3 joins
        "user_activity": J.user_activity,
        "revenue_by_region": J.revenue_by_region,
        "customers_with_orders": J.customers_with_orders,
        "customers_without_orders": J.customers_without_orders,
        # §2.2 / §2.7 / §2.8 projections, filters, unions, scalar fns
        "silver_products": P.silver_products,
        "daily_slice": P.daily_slice,
        "ts_range_filter": P.ts_range_filter,
        "multi_source_union": P.multi_source_union,
        "string_normalize": P.string_normalize,
        "date_math": P.date_math,
        "bucketize": P.bucketize,
        "json_extract": P.json_extract,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "daily_revenue": """
            SELECT CAST(o_orderdate AS DATE) AS activity_date,
                   COUNT(o_orderkey) AS orders_count,
                   CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value,
                   COUNT(DISTINCT o_custkey) AS unique_customers
            FROM orders
            GROUP BY CAST(o_orderdate AS DATE)
        """,
        "category_profile": """
            SELECT p_type,
                   COUNT(*) AS product_count,
                   MIN(p_retailprice) AS min_price,
                   MAX(p_retailprice) AS max_price,
                   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price
            FROM part
            GROUP BY p_type
        """,
        "finance_kpis": """
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS average_order_value,
                   COUNT(*) AS orders_count,
                   COUNT(DISTINCT o_custkey) AS unique_customers
            FROM orders
            WHERE CAST(o_orderdate AS DATE) =
                  (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
        """,
        "duplicate_check": """
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events
            GROUP BY user_id, event_type
            HAVING COUNT(*) > 1
        """,
        "null_counts": """
            SELECT COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS null_orderkey,
                   COUNT(*) FILTER (WHERE o_custkey IS NULL) AS null_custkey,
                   COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS null_totalprice,
                   COUNT(*) AS total_rows
            FROM orders
        """,
        "value_counts_topk": """
            SELECT c_mktsegment, COUNT(*) AS cnt
            FROM customer
            GROUP BY c_mktsegment
            ORDER BY cnt DESC, c_mktsegment ASC
            LIMIT 10
        """,
        "summary_stats": """
            SELECT MIN(c_acctbal) AS min_bal,
                   MAX(c_acctbal) AS max_bal,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
                   MEDIAN(c_acctbal) AS median_bal,
                   COUNT(*) AS n
            FROM customer
        """,
        "count_by_day": """
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events
            GROUP BY CAST(ts AS DATE)
            ORDER BY day DESC
            LIMIT 10
        """,
        "dedup_latest_event": """
            SELECT event_id, user_id, event_type, ts, value
            FROM (
                SELECT event_id, user_id, event_type, ts, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "dedup_first_event": """
            SELECT event_id, user_id, event_type, ts
            FROM (
                SELECT event_id, user_id, event_type, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts ASC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "distinct_projection": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "top_products_daily": """
            WITH monthly AS (
                SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
                       l_partkey,
                       SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
                FROM lineitem
                GROUP BY 1, 2
            ), ranked AS (
                SELECT ship_month, l_partkey, rev,
                       ROW_NUMBER() OVER (PARTITION BY ship_month
                                          ORDER BY rev DESC, l_partkey ASC) AS rnk
                FROM monthly
            )
            SELECT ship_month, l_partkey, CAST(rev AS DOUBLE) AS revenue, rnk
            FROM ranked WHERE rnk <= 3
        """,
        "running_totals": """
            SELECT o_custkey, o_orderkey,
                   CAST(o_orderdate AS DATE) AS order_date,
                   ROW_NUMBER() OVER w AS order_seq,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                        (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                        AS running_spend,
                   date_diff('day',
                             CAST(LAG(o_orderdate, 1) OVER w AS DATE),
                             CAST(o_orderdate AS DATE)) AS days_since_prev
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        """,
        "user_activity": """
            SELECT c.c_custkey, c.c_name,
                   COUNT(DISTINCT o.o_orderkey) AS order_count,
                   CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_order_value,
                   MAX(CAST(o.o_orderdate AS DATE)) AS last_order_date
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_name
        """,
        "revenue_by_region": """
            SELECT r.r_name,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   COUNT(*) AS lineitem_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "customers_with_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "silver_products": """
            SELECT CAST(p_partkey AS BIGINT) AS product_id,
                   p_name AS title,
                   CAST(p_retailprice AS DECIMAL(15,2)) AS price,
                   p_type AS category,
                   p_size > 0 AS is_available
            FROM part
        """,
        "daily_slice": """
            WITH busiest AS (
                SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS cnt
                FROM lineitem GROUP BY 1
                ORDER BY cnt DESC, d ASC LIMIT 1
            )
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                   CAST(l_shipdate AS DATE) AS ship_date
            FROM lineitem, busiest
            WHERE CAST(l_shipdate AS DATE) = busiest.d
        """,
        "ts_range_filter": """
            WITH b AS (
                SELECT CAST(MAX(ts) AS DATE) - 7 AS start_d,
                       CAST(MAX(ts) AS DATE) AS end_d
                FROM events
            )
            SELECT event_id, user_id, event_type, ts, value
            FROM events, b
            WHERE ts >= CAST(start_d AS TIMESTAMP) AND ts < CAST(end_d AS TIMESTAMP)
        """,
        "multi_source_union": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   'fakestore' AS _source_name
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice,
                   'dummyjson' AS _source_name
            FROM orders WHERE o_orderkey % 2 = 1
        """,
        "string_normalize": """
            SELECT c_custkey,
                   LOWER(TRIM(c_name)) AS norm_name,
                   LOWER(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')) || '@example.com' AS email,
                   regexp_matches(
                       LOWER(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')) || '@example.com',
                       '^[\\w.+-]+@[\\w.-]+\\.\\w{2,}$') AS email_ok,
                   contains(c_name, '1') AS has_digit_one,
                   regexp_replace('+1 (555) ' || CAST(c_custkey AS VARCHAR),
                                  '[^\\d\\-\\+\\s]', '', 'g') AS phone
            FROM customer
        """,
        "date_math": """
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) AS order_date,
                   CAST(o_orderdate AS DATE) - 7 AS week_before,
                   CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   CAST(month(o_orderdate) AS INTEGER) AS order_month,
                   CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow
            FROM orders
        """,
        "bucketize": """
            SELECT c_custkey,
                   CAST(FLOOR(fmod(ABS(c_acctbal), 100)) AS BIGINT) AS pseudo_age,
                   CASE WHEN FLOOR(fmod(ABS(c_acctbal), 100)) <= 18 THEN '0-18'
                        WHEN FLOOR(fmod(ABS(c_acctbal), 100)) <= 35 THEN '19-35'
                        WHEN FLOOR(fmod(ABS(c_acctbal), 100)) <= 50 THEN '36-50'
                        WHEN FLOOR(fmod(ABS(c_acctbal), 100)) <= 65 THEN '51-65'
                        ELSE '65+' END AS age_group,
                   ROUND(c_acctbal, 2) AS bal_rounded
            FROM customer
        """,
        "json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS prop_k_mod
            FROM events
        """,
    }
