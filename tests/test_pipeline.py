"""End-to-end medallion pipeline test on reference-shaped fixtures
(FIXTURES.md §2): ingest → bronze (quarantine) → silver (dedup/upsert)
→ quality → gold marts, plus idempotency of re-runs."""

import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.pipelines.runner import run_pipeline
from doeecommerce_datapipeline_spark.audit.ledger import AuditLedger


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("warehouse"))
    run_pipeline(spark, base, layer="all")
    return base


def test_bronze_loaded_with_lineage(spark, warehouse):
    b = spark.read.parquet(f"{warehouse}/bronze/products_raw")
    assert b.count() > 800
    assert {"_ingestion_timestamp", "_source_name", "_endpoint", "_table_name"} <= set(b.columns)


def test_quarantine_catches_invalid_users(spark, warehouse):
    q = spark.read.parquet(f"{warehouse}/quarantine/users_raw")
    reasons = {r[0] for r in q.select(F.explode("_violations")).distinct().collect()}
    assert "email_valid_email" in reasons
    assert "age_in_range" in reasons
    assert "gender_isin" in reasons


def test_silver_products_deduped(spark, warehouse):
    s = spark.read.parquet(f"{warehouse}/silver/products")
    assert s.count() == s.select("product_id").distinct().count()
    assert s.where(F.col("price") < 0).isEmpty()


def test_silver_carts_guarded_division(spark, warehouse):
    s = spark.read.parquet(f"{warehouse}/silver/carts")
    zero = s.where(F.col("total_value") == 0)
    assert not zero.isEmpty()
    assert zero.where(F.col("discount_percentage") != 0).isEmpty()


def test_silver_users_normalized(spark, warehouse):
    s = spark.read.parquet(f"{warehouse}/silver/users")
    assert s.count() == s.select("email").distinct().count()
    bad = s.where(F.col("email") != F.lower(F.trim(F.col("email"))))
    assert bad.isEmpty()


def test_silver_cart_items_exploded(spark, warehouse):
    items = spark.read.parquet(f"{warehouse}/silver/cart_items")
    carts = spark.read.parquet(f"{warehouse}/silver/carts")
    # every deduped cart contributes its line items, no orphans
    assert items.select("cart_id").distinct().count() == carts.count()
    assert items.where(F.col("line_total") != F.col("quantity") * F.col("unit_price")).isEmpty()
    # re-running the transform must not double the lines (keyed upsert)
    from doeecommerce_datapipeline_spark.pipelines.runner import run_transformation

    before = items.count()
    run_transformation(spark, warehouse, ["carts"])
    assert spark.read.parquet(f"{warehouse}/silver/cart_items").count() == before


def test_transformation_idempotent(spark, warehouse):
    from doeecommerce_datapipeline_spark.pipelines.runner import run_transformation

    before = spark.read.parquet(f"{warehouse}/silver/products").count()
    run_transformation(spark, warehouse, ["products"])
    after = spark.read.parquet(f"{warehouse}/silver/products").count()
    assert before == after


def test_gold_marts_published(spark, warehouse):
    fin = spark.read.parquet(f"{warehouse}/gold/finance_mart")
    row = fin.collect()
    assert len(row) == 1
    # default kpi_date=today matches last_updated=now → non-empty slice
    assert row[0]["carts_count"] > 0
    sales = spark.read.parquet(f"{warehouse}/gold/sales_mart")
    srow = sales.collect()[0]
    assert srow["top_products"]  # the column the reference never fills
    assert srow["total_carts"] > 0
    ops = spark.read.parquet(f"{warehouse}/gold/operations_mart")
    r = ops.collect()[0]
    assert 0.0 <= r["order_fulfillment_rate"] <= 1.0
    assert 0.0 <= r["cart_abandonment_rate"] <= 1.0


def test_gold_republish_idempotent(spark, warehouse):
    from datetime import date

    from doeecommerce_datapipeline_spark.pipelines.runner import run_gold

    run_gold(spark, warehouse, date.today())
    fin = spark.read.parquet(f"{warehouse}/gold/finance_mart")
    assert fin.count() == 1  # date-keyed upsert, not append


def test_audit_ledger_lifecycle(spark, warehouse):
    ledger = AuditLedger(spark, f"{warehouse}/audit/ingestion_log")
    cur = ledger.current_state()
    states = {r["status"] for r in cur.collect()}
    assert states <= {"SUCCESS", "PARTIAL"}
    assert cur.count() == 4  # one run per table
    assert ledger.history().count() == 8  # open + close per run


# ---- additive schema evolution (dummyjson_ingestor.py:358-405 analog) ----


def test_evolution_new_column_appears_null_for_history(spark, tmp_path):
    """An evolving API payload grows a column; historic rows read back
    NULL for it — the mergeSchema analog of ALTER TABLE ADD COLUMN."""
    from doeecommerce_datapipeline_spark.evolution import (
        append_evolving,
        read_evolving,
    )

    path = str(tmp_path / "bronze_products")
    v1 = spark.createDataFrame([(1, "widget")], "id long, title string")
    v2 = spark.createDataFrame(
        [(2, "gadget", 9.5)], "id long, title string, rating double"
    )
    append_evolving(spark, v1, path)
    append_evolving(spark, v2, path)
    out = {r["id"]: r for r in read_evolving(spark, path).collect()}
    assert set(out[1].asDict()) == {"id", "title", "rating"}
    assert out[1]["rating"] is None
    assert out[2]["rating"] == 9.5


def test_evolution_narrow_batch_cast_up_no_rewrite(spark, tmp_path):
    """A batch arriving with int where the table holds long is cast up;
    the historic files are untouched."""
    import glob

    from doeecommerce_datapipeline_spark.evolution import append_evolving

    path = str(tmp_path / "t")
    append_evolving(spark, spark.createDataFrame([(10,)], "n long"), path)
    before = sorted(glob.glob(path + "/*.parquet"))
    append_evolving(spark, spark.createDataFrame([(11,)], "n int"), path)
    assert sorted(set(before) & set(glob.glob(path + "/*.parquet"))) == before
    out = spark.read.parquet(path)
    assert out.schema["n"].dataType.simpleString() == "bigint"
    assert {r["n"] for r in out.collect()} == {10, 11}


def test_evolution_wider_batch_rewrites_history(spark, tmp_path):
    """int table + double batch → one-time widening rewrite; both eras
    read back as double."""
    from doeecommerce_datapipeline_spark.evolution import (
        append_evolving,
        read_evolving,
    )

    path = str(tmp_path / "t")
    append_evolving(spark, spark.createDataFrame([(1,)], "price int"), path)
    append_evolving(spark, spark.createDataFrame([(2.5,)], "price double"), path)
    out = read_evolving(spark, path)
    assert out.schema["price"].dataType.simpleString() == "double"
    assert {r["price"] for r in out.collect()} == {1.0, 2.5}


def test_evolution_incompatible_change_raises(spark, tmp_path):
    from doeecommerce_datapipeline_spark.evolution import (
        SchemaEvolutionError,
        append_evolving,
    )

    path = str(tmp_path / "t")
    append_evolving(spark, spark.createDataFrame([("x",)], "v string"), path)
    with pytest.raises(SchemaEvolutionError):
        append_evolving(spark, spark.createDataFrame([(1,)], "v int"), path)
