"""Table profiling: per-column null counts + cardinality in one
aggregate pass — the data-profiling primitive (deequ/Glue-crawler
class) that fronts every new-source onboarding.

Shape: ONE aggregate computes every column's metrics side by side
(null counts are plain conditional sums; distinct counts share the
single Expand pass Spark plans for multi-countDistinct), and the
single metrics row unpivots into per-column rows map-side. At 100 TB
set ``exact=False`` so cardinalities come from HLL sketches — same
plan, bounded memory, no Expand fan-out.

Reference analog: the quality-check count queries (C4,
quality_checks.py) generalized from per-table hand-written SQL to any
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct) — one row per
    profiled column, computed in one aggregate job."""
    names = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nulls_{c}")
        )
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"_dist_{c}")
        )
    row = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(dtypes[c]).alias("dtype"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"_nulls_{c}").alias("n_nulls"),
                    F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                )
                for c in names
            ]
        )
    ).alias("p")
    return row.select(per_col).select(
        "p.column", "p.dtype", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry shape: exact profile of the events table (6 columns in
    one pass; the DuckDB twin recomputes each column's metrics)."""
    return profile(table(spark, sf_dir, "events"))
