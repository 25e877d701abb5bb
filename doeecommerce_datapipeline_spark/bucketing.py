"""Bucketed-table layout: shuffle-free co-located joins
(SURVEY.md §4.1 data-layout row; the pyspark guide's bucketing note).

At 100 TB the lineitem⋈orders class of join dominates runtime; writing
both tables bucketed by the join key once turns every subsequent join
into a zip of co-located buckets — no exchange on either side. This
module is the layout path the one-shot parquet scans don't need at
test scale but a production deployment would adopt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the sort from
    sort-merge joins."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables — with matching bucket specs the
    plan contains no Exchange on either side (verify via explain)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
