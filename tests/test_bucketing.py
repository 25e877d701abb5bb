"""Bucketed co-located join: identical bucket specs must eliminate the
shuffle on both sides of the join."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.bucketing import bucketed_join, write_bucketed
from doeecommerce_datapipeline_spark.io import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    # disable auto-broadcast so the test observes bucketing, not AQE
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sf = "/root/testdata/sf0.001"
    write_bucketed(
        table(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice"),
        "li_b", "l_orderkey", 8, sort_col="l_orderkey",
    )
    write_bucketed(
        table(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        "ord_b", "o_orderkey", 8, sort_col="o_orderkey",
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, "bucketed join still shuffles"

    # and the result matches the plain-parquet join
    sf = "/root/testdata/sf0.001"
    expected = (
        table(spark, sf, "lineitem")
        .join(
            table(spark, sf, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected
