"""The SQL view layer: every testdata table registers as a temp view
and spark.sql() formulations produce byte-identical results to the
DataFrame API operators — the two surfaces share one Catalyst plan
space, so users can mix them freely."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.io import register_views
from doeecommerce_datapipeline_spark.operators.aggregates import daily_revenue
from doeecommerce_datapipeline_spark.operators.joins import revenue_by_region


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_view_layer_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)

    sql_daily = spark.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS activity_date,
               COUNT(o_orderkey) AS orders_count,
               CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_revenue,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(o_totalprice) AS avg_order_value,
               COUNT(DISTINCT o_custkey) AS unique_customers
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
        """
    )
    assert _rows(sql_daily) == _rows(daily_revenue(spark, sf_dir))

    sql_region = spark.sql(
        """
        SELECT r.r_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS lineitem_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )
    assert _rows(sql_region) == _rows(revenue_by_region(spark, sf_dir))


def test_views_cover_every_table(spark, sf_dir):
    register_views(spark, sf_dir)
    from doeecommerce_datapipeline_spark.io import TABLES

    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").columns
    # events registers through the nanos-safe path: ts must be usable
    assert (
        spark.sql("SELECT max(ts) AS m FROM events").collect()[0]["m"] is not None
    )
