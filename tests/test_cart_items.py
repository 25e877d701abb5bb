"""cart_items silver table (the ArrayType modeling upgrade) and the
quality-gate failure path."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark import fixtures
from doeecommerce_datapipeline_spark.pipelines.silver import transform_cart_items
from doeecommerce_datapipeline_spark.schemas import CARTS_RAW
from doeecommerce_datapipeline_spark.sources.rest import RecordsSource


def test_cart_items_explode_after_dedup(spark):
    df = RecordsSource(spark, CARTS_RAW).to_df(fixtures.carts_raw(300))
    items = transform_cart_items(df)

    # dedup-then-explode: each cart contributes exactly its latest
    # version's line count, even though ~10% of cart ids repeat in raw
    w = Window.partitionBy("id").orderBy(F.col("_ingestion_timestamp").desc())
    latest_lines = {
        r["id"]: r["n"]
        for r in df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", F.size("products").alias("n"))
        .collect()
    }
    got_lines = {
        r["cart_id"]: r["n"]
        for r in items.groupBy("cart_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_lines == latest_lines

    # line_total is exact decimal qty×price
    bad = items.where(
        F.col("line_total")
        != (F.col("quantity") * F.col("unit_price")).cast("decimal(18,2)")
    )
    assert bad.isEmpty()


def test_quality_gate_fails_on_duplicate_pk(spark):
    from doeecommerce_datapipeline_spark.quality.checks import (
        TableChecks,
        all_passed,
        run_checks,
    )

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "pk long, v string")
    results = run_checks(spark, df, TableChecks("t", "pk"))
    assert not all_passed(results)
    dup_row = [r for r in results.collect() if r["check"] == "duplicate_check"][0]
    assert dup_row["violations"] == 1 and not dup_row["passed"]
