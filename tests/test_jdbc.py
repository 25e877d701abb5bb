"""JDBC source/sink round-trip against embedded Derby (ships with
Spark's jars — a real JDBC driver + database, no network). Skips if the
driver isn't on the classpath (other Spark distributions)."""

import pytest

from doeecommerce_datapipeline_spark.io import read_jdbc, write_jdbc


def _derby_available(spark) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the Spark classpath")
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "widget", 9.99), (2, "gadget", 19.5), (3, "gizmo", 0.25)],
        "id bigint, title string, price double",
    )
    write_jdbc(df, derby_url, "products", mode="overwrite")
    back = read_jdbc(spark, derby_url, "products")
    got = sorted((r["id"], r["title"], r["price"]) for r in back.collect())
    assert got == [(1, "widget", 9.99), (2, "gadget", 19.5), (3, "gizmo", 0.25)]


def test_jdbc_partitioned_read(spark, derby_url):
    """The scale path: range-partitioned scan fans out one query per
    partition; union of partitions must equal the table exactly."""
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    write_jdbc(df, derby_url, "nums", mode="overwrite")
    back = read_jdbc(
        spark,
        derby_url,
        "nums",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 2 for i in range(100))


def test_jdbc_pushdown_reaches_remote_scan(spark, derby_url):
    """A filter on the JDBC relation must appear as a pushed predicate
    (the remote database does the filtering, not Spark)."""
    write_jdbc(spark.range(0, 50).selectExpr("id"), derby_url, "t_push", mode="overwrite")
    back = read_jdbc(spark, derby_url, "t_push").where("id >= 40")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "40" in plan
    assert back.count() == 10
