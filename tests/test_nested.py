"""P6/P7 (nested-struct flattening) and F14/F15 (array<struct> ⇄ JSON)
coverage — the reference's json_normalize machinery collapses to
nested selects (SURVEY.md §1.2); cart line-items stay native arrays
and serialize only at the export boundary."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark import fixtures
from doeecommerce_datapipeline_spark.schemas import CARTS_RAW, USERS_RAW
from doeecommerce_datapipeline_spark.sources.rest import RecordsSource


def test_flatten_nested_user_structs(spark):
    """P6: json_normalize (fakestore_ingestor.py:384-423) == one select
    of nested paths; P7: .get chains w/ defaults == coalesce."""
    df = RecordsSource(spark, USERS_RAW).to_df(fixtures.users_raw(50))
    flat = df.select(
        "id",
        F.col("name.first").alias("name_first"),
        F.col("name.last").alias("name_last"),
        F.col("address.city").alias("addr_city"),
        F.col("address.geolocation.lat").alias("geo_lat"),
        F.coalesce(F.col("age"), F.lit(0)).alias("age_safe"),
    )
    rows = flat.collect()
    assert all(r["name_first"] is not None for r in rows)
    assert all(r["geo_lat"] is not None for r in rows)
    assert "name" not in flat.columns  # dropped by not selecting


def test_cart_lines_explode_and_json_roundtrip(spark):
    """F14/F15: the reference serializes cart lines to TEXT
    (dummyjson_ingestor.py:541-547); here they explode natively and
    to_json/from_json round-trips losslessly at the export boundary."""
    df = RecordsSource(spark, CARTS_RAW).to_df(fixtures.carts_raw(100))
    lines = df.select("id", F.explode("products").alias("line")).select(
        "id", "line.productId", "line.quantity", "line.price"
    )
    assert lines.count() > 100  # fan-out happened
    assert lines.where(F.col("quantity") <= 0).isEmpty()

    as_json = df.select("id", F.to_json("products").alias("products_json"))
    schema = df.schema["products"].dataType
    back = as_json.select(
        "id", F.from_json("products_json", schema).alias("products")
    )
    orig_counts = {r["id"]: r["n"] for r in df.select("id", F.size("products").alias("n")).collect()}
    back_counts = {r["id"]: r["n"] for r in back.select("id", F.size("products").alias("n")).collect()}
    assert orig_counts == back_counts


def test_line_revenue_aggregate(spark):
    """The analysis the TEXT serialization destroys in the reference:
    per-cart line revenue via a higher-order fold, no explode needed."""
    df = RecordsSource(spark, CARTS_RAW).to_df(fixtures.carts_raw(100))
    rev = df.select(
        "id",
        F.aggregate(
            "products",
            F.lit(0.0),
            lambda acc, p: acc
            + p["quantity"].cast("double") * p["price"].cast("double"),
        ).alias("line_revenue"),
    )
    assert rev.where(F.col("line_revenue") <= 0).isEmpty()
