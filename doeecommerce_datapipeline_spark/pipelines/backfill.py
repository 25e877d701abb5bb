"""Backfill runner (SURVEY.md §2.11 C6 — reference scripts/backfill.py:
50-299): re-ingest a date window = delete the window + reload + verify.

The Spark idiom is the S12 range-replace (Delta: `replaceWhere`); the
verification step mirrors the reference's post-backfill queries
(row counts, daily distribution, null-id scan, backfill.py:248-299).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.parquet_sinks import backfill_replace_range


def backfill_window(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    ts_col: str,
    start,
    end,
) -> dict:
    """Replace [start, end) with `new_rows`, then verify. Returns the
    verification report the reference prints (backfill.py:248-299)."""
    backfill_replace_range(spark, new_rows, path, ts_col, start, end)
    df = spark.read.parquet(path)
    in_window = df.where(
        (F.col(ts_col) >= F.lit(start).cast("timestamp"))
        & (F.col(ts_col) < F.lit(end).cast("timestamp"))
    )
    daily = (
        in_window.groupBy(F.to_date(ts_col).alias("day"))
        .count()
        .orderBy(F.desc("day"))
        .limit(10)
        .collect()
    )
    return {
        "total_rows": df.count(),
        "window_rows": in_window.count(),
        "daily_counts": [(str(r["day"]), r["count"]) for r in daily],
        "null_ids": in_window.where(F.col(in_window.columns[0]).isNull()).count(),
    }
