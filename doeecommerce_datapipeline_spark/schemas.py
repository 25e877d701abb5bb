"""Explicit StructType schemas for the reference's data model
(SURVEY.md §1.4; DDL at reference database/db_setup.py:494-634).

The one deliberate upgrade: cart line-items stay ArrayType(Struct)
instead of the reference's JSON-TEXT serialization
(db_setup.py:524, dummyjson_ingestor.py:541-547) — explode-able,
prune-able, and to_json is applied only at an export boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T

# nullable: sources may deliver rows before the ingestor stamps them
# (with_lineage fills whatever is missing at load time)
LINEAGE_FIELDS = [
    T.StructField("_ingestion_timestamp", T.TimestampType(), True),
    T.StructField("_source_name", T.StringType(), True),
    T.StructField("_endpoint", T.StringType(), True),
    T.StructField("_table_name", T.StringType(), True),
]

PRODUCTS_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("price", T.DecimalType(15, 2), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("image", T.StringType(), True),
        T.StructField("rating", T.DecimalType(3, 2), True),
    ]
    + LINEAGE_FIELDS
)

CART_LINE = T.StructType(
    [
        T.StructField("productId", T.LongType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("price", T.DecimalType(15, 2), True),
    ]
)

CARTS_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("userId", T.LongType(), True),
        T.StructField("total", T.DecimalType(15, 2), True),
        T.StructField("discountedTotal", T.DecimalType(15, 2), True),
        T.StructField("products", T.ArrayType(CART_LINE), True),
        T.StructField("totalProducts", T.IntegerType(), True),
        T.StructField("totalQuantity", T.IntegerType(), True),
    ]
    + LINEAGE_FIELDS
)

USERS_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("username", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("firstname", T.StringType(), True),
        T.StructField("lastname", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField(
            "name",
            T.StructType(
                [
                    T.StructField("first", T.StringType(), True),
                    T.StructField("last", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("city", T.StringType(), True),
                    T.StructField("street", T.StringType(), True),
                    T.StructField("zipcode", T.StringType(), True),
                    T.StructField(
                        "geolocation",
                        T.StructType(
                            [
                                T.StructField("lat", T.StringType(), True),
                                T.StructField("long", T.StringType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
    + LINEAGE_FIELDS
)

ORDERS_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("userId", T.LongType(), True),
        T.StructField("date", T.DateType(), True),
        # per the evident intent of transform_orders
        # (transform_silver.py:44 references total_amount, absent from
        # the bronze DDL db_setup.py:540-552 — a reference bug; we
        # build to the intent, SURVEY.md §7.4(7))
        T.StructField("total_amount", T.DecimalType(15, 2), True),
    ]
    + LINEAGE_FIELDS
)

# silver schemas (db_setup.py:576-634)
SILVER_PRODUCTS = "product_id long, title string, price decimal(15,2), category string, is_available boolean, last_updated timestamp"
SILVER_CARTS = "cart_id long, user_id long, total_value decimal(15,2), discount_percentage decimal(5,2), last_updated timestamp"
SILVER_ORDERS = "order_id long, user_id long, total_amount decimal(15,2), final_amount decimal(15,2), last_updated timestamp"
SILVER_USERS = "user_id long, email string, full_name string, last_updated timestamp"
