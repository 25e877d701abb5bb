"""Projection / filter / scalar-function operators
(SURVEY.md §2.2 P1–P11, §2.7 U1, §2.8 F1–F17).

All pure narrow transformations — no shuffle; Catalyst pushes the
filters and the column pruning into the parquet scan (verify via
`.explain()` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import age_bucket, clean_phone, is_valid_email
from ..io import table


def silver_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P8: column subset + rename map + casts — the bronze→silver
    projection (load_bronze.py:71-73 mapping, transform_silver.py:31-34)
    applied to part as the products stand-in.

    ``price`` goes through the canonical decimal(15,2) rounding step but
    is surfaced as DOUBLE per the repo-wide determinism contract (money
    columns cross the engine boundary as double; decimal is internal)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").cast("long").alias("product_id"),
        F.col("p_name").alias("title"),
        F.col("p_retailprice").cast("decimal(15,2)").cast("double").alias("price"),
        F.col("p_type").alias("category"),
        (F.col("p_size") > 0).alias("is_available"),
    )


def daily_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: date-equality predicate — the gold layer's daily KPI slice
    (publish_gold.py:34,56-57): WHERE CAST(ts AS DATE) = :kpi_date.
    Picks the busiest ship date deterministically, then slices.
    At scale this predicate is partition pruning on a date-partitioned
    fact table."""
    l = table(spark, sf_dir, "lineitem")
    busiest = (
        l.groupBy(F.to_date("l_shipdate").alias("d"))
        .count()
        .orderBy(F.desc("count"), F.asc("d"))
        .limit(1)
        .select("d")
    )
    return (
        l.join(F.broadcast(busiest), F.to_date("l_shipdate") == F.col("d"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.to_date("l_shipdate").alias("ship_date"),
        )
    )


def ts_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: timestamp-range predicate — retention/backfill cutoffs
    (scripts/cleanup.py:226-229, backfill.py:181-185): rows in
    [start, end) relative to the table's max timestamp."""
    e = table(spark, sf_dir, "events")
    bounds = e.select(
        F.date_sub(F.max("ts").cast("date"), 7).alias("start"),
        F.max("ts").cast("date").alias("end"),
    )
    return (
        e.join(
            F.broadcast(bounds),
            (F.col("ts") >= F.col("start").cast("timestamp"))
            & (F.col("ts") < F.col("end").cast("timestamp")),
        )
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


def multi_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+P3: multi-source UNION ALL with lineage columns — fakestore +
    dummyjson both appending into one bronze table
    (ingestion_util.py:478-486). Two disjoint slices of orders tagged
    with _source_name, unioned by name."""
    o = table(spark, sf_dir, "orders")
    src_a = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit("fakestore").alias("_source_name"),
    )
    src_b = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit("dummyjson").alias("_source_name"),
    )
    return src_a.unionByName(src_b)


def string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F5: lower/trim, concat, contains, regex match, regex replace
    (dummyjson_ingestor.py:570-577; validator.py:47-53;
    randomuser_ingestor.py:254-255) over customer names."""
    c = table(spark, sf_dir, "customer")
    synth_email = F.concat(
        F.lower(F.regexp_replace("c_name", r"[^A-Za-z0-9]", ".")),
        F.lit("@example.com"),
    )
    return c.select(
        "c_custkey",
        F.lower(F.trim("c_name")).alias("norm_name"),
        synth_email.alias("email"),
        is_valid_email(synth_email).alias("email_ok"),
        F.col("c_name").contains("1").alias("has_digit_one"),
        clean_phone(F.concat(F.lit("+1 (555) "), F.col("c_custkey").cast("string"))).alias(
            "phone"
        ),
    )


def date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6–F9: cast-to-date, date arithmetic, duration
    (publish_gold.py:34; cleanup.py:101; base_generator.py:38-42)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.date_sub(F.to_date("o_orderdate"), 7).alias("week_before"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
    )


def bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: categorical binning (pd.cut, randomuser_ingestor.py:258-264)
    — acctbal scaled into the reference's age-style buckets, plus
    guarded rounding F10."""
    c = table(spark, sf_dir, "customer")
    pseudo_age = F.floor(F.abs(F.col("c_acctbal")) % 100).cast("long")
    return c.select(
        "c_custkey",
        pseudo_age.alias("pseudo_age"),
        age_bucket(pseudo_age).alias("age_group"),
        F.round(F.col("c_acctbal"), 2).alias("bal_rounded"),
    )


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F15: JSON parse of the events.props payload
    (dummyjson_ingestor.py:541-547 serializes; we parse natively) —
    get_json_object + typed cast."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("prop_k_mod"),
    )


def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator family in one query: the distinct user-id universes
    of events vs orders combined with INTERSECT, EXCEPT, and UNION
    (set_op, n_users).

    The reference has no INTERSECT/EXCEPT (SURVEY.md §2.7 — its only
    except-like behavior is the upsert anti-join); a complete engine
    needs them. Each branch distincts a single id column first, so the
    set operation shuffles bare longs — never whole rows — and the
    three single-row counts union at the end (no data co-location
    needed between branches).
    """
    e = table(spark, sf_dir, "events").select("user_id").distinct()
    o = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"))
        .distinct()
    )

    def labeled(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("set_op"), "n_users"
        )

    return (
        labeled("intersect", e.intersect(o))
        .unionByName(labeled("except_events_only", e.subtract(o)))
        .unionByName(labeled("union", e.union(o).distinct()))
    )
