"""Additive schema evolution + explicit type widening for parquet
tables — the Spark-first analog of the reference's dynamic-column
bootstrap (`ingestion/dummyjson_ingestor.py:358-405`
`_ensure_columns_exist`: inspect target schema, `ALTER TABLE ADD
COLUMN` for new payload fields, dtype→SQL-type mapping; SURVEY.md §1.3
maps it to ``mergeSchema=true`` + a widening policy).

Semantics:

- **Additive columns** — a new batch may carry columns the table has
  never seen; they land as-is, and ``read_evolving`` (mergeSchema)
  surfaces them as NULL for historic rows. No table rewrite — exactly
  the reference's ADD COLUMN, expressed as parquet file-schema union.
- **Type widening** — when the same column arrives at a different
  type, the WIDENING lattice decides: the batch is cast UP to the
  table's type when the table is wider; when the BATCH is wider, the
  historic files are rewritten once at the widened type (parquet
  mergeSchema cannot reconcile int files with double files at read
  time). At 100 TB the rewrite becomes a metadata-level type promotion
  (Iceberg v3 style) or a staged background rewrite; the policy —
  which promotions are legal — is the part that carries over.
- **Incompatible change** (e.g. string → int) raises
  ``SchemaEvolutionError``: silent data corruption is never a policy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class SchemaEvolutionError(ValueError):
    pass


# Widening lattice: a type may be promoted rightward within its chain.
# Mirrors the reference's dtype→SQL mapping (int*→INTEGER, float*→
# NUMERIC) generalized to an ordered chain; cross-chain moves are
# incompatible (no implicit anything→string: that is how type errors
# hide, the opposite of the reference's explicit TEXT default).
_NUMERIC_CHAIN: list[type[DataType]] = [
    ByteType,
    ShortType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
]
_TEMPORAL_CHAIN: list[type[DataType]] = [DateType, TimestampType]


def _chain_rank(dt: DataType) -> tuple[str, int] | None:
    for chain_name, chain in (
        ("numeric", _NUMERIC_CHAIN),
        ("temporal", _TEMPORAL_CHAIN),
    ):
        for i, t in enumerate(chain):
            if isinstance(dt, t):
                return chain_name, i
    return None


def widen_type(a: DataType, b: DataType) -> DataType:
    """The narrowest type both `a` and `b` promote to, or raise."""
    if a == b:
        return a
    if isinstance(a, DecimalType) and isinstance(b, DecimalType):
        scale = max(a.scale, b.scale)
        intdigits = max(a.precision - a.scale, b.precision - b.scale)
        return DecimalType(min(intdigits + scale, 38), scale)
    # decimal absorbs any integral type; float/double vs decimal → double
    for x, y in ((a, b), (b, a)):
        if isinstance(x, DecimalType):
            ry = _chain_rank(y)
            if ry and ry[0] == "numeric":
                if ry[1] <= _NUMERIC_CHAIN.index(LongType):
                    return x if x.precision - x.scale >= 20 else DecimalType(38, x.scale)
                return DoubleType()
    ra, rb = _chain_rank(a), _chain_rank(b)
    if ra and rb and ra[0] == rb[0]:
        chain = _NUMERIC_CHAIN if ra[0] == "numeric" else _TEMPORAL_CHAIN
        return chain[max(ra[1], rb[1])]()
    raise SchemaEvolutionError(
        f"incompatible type change: {a.simpleString()} <-> {b.simpleString()}"
    )


def merge_schemas(table_schema: StructType, batch_schema: StructType) -> StructType:
    """Union of fields; shared fields take the widened type. Field order
    is table-first (stable reads), new batch columns append at the end
    — same visible effect as the reference's ALTER TABLE ADD COLUMN."""
    table_names = {f.name for f in table_schema.fields}
    batch_by_name = {f.name: f for f in batch_schema.fields}
    out: list[StructField] = []
    for f in table_schema.fields:
        if f.name in batch_by_name:
            widened = widen_type(f.dataType, batch_by_name[f.name].dataType)
            out.append(StructField(f.name, widened, True))
        else:
            out.append(StructField(f.name, f.dataType, True))
    for f in batch_schema.fields:
        if f.name not in table_names:
            out.append(StructField(f.name, f.dataType, True))
    return StructType(out)


def conform(df: DataFrame, target: StructType) -> DataFrame:
    """Cast/extend df to the target schema (missing columns → NULL)."""
    cols = []
    have = set(df.columns)
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-union read: mergeSchema folds every file's footer schema
    into one — additive columns surface as NULL on historic rows."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def append_evolving(spark: SparkSession, df: DataFrame, path: str) -> StructType:
    """Append a batch whose schema may have evolved. Returns the
    table's post-append schema.

    - table absent → plain write
    - batch narrower/equal → cast batch up, append (no rewrite)
    - batch wider → one-time rewrite of historic files at the widened
      type, then append
    - incompatible → SchemaEvolutionError before anything is written
    """
    if not os.path.exists(path):
        df.write.mode("overwrite").parquet(path)
        return df.schema
    existing = read_evolving(spark, path)
    target = merge_schemas(existing.schema, df.schema)
    existing_types = {f.name: f.dataType for f in existing.schema.fields}
    needs_rewrite = any(
        f.name in existing_types and f.dataType != existing_types[f.name]
        for f in target.fields
    )
    if needs_rewrite:
        from .sinks.parquet_sinks import _swap_write

        _swap_write(spark, conform(existing, target), path)
    conform(df, target).write.mode("append").parquet(path)
    return target
