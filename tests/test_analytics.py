"""Bounds tests for the approximate (rows-only) aggregates."""

from doeecommerce_datapipeline_spark.operators.analytics import approx_aggregates


def test_approx_within_bounds(spark, sf_dir):
    r = approx_aggregates(spark, sf_dir).collect()[0]
    assert abs(r["approx_orders"] - r["exact_orders"]) / r["exact_orders"] < 0.10
    assert (
        abs(r["approx_median_price"] - r["exact_median_price"])
        / r["exact_median_price"]
        < 0.05
    )
