"""Data-layout strategies for the 100 TB target (SURVEY.md §4.1:
"replace B-tree indexes with date/category partitioning + Z-order").

The reference tunes reads with Postgres B-tree indexes
(database/db_setup.py:511,532,549-550,570-571,587-588). A lakehouse
has two levers instead, both implemented here:

1. **Hive-style partition directories** — a `WHERE part_col = x`
   predicate never opens non-matching directories (partition pruning;
   visible as `PartitionFilters` in the scan node). Right for
   low-cardinality columns that gate most queries: the daily-batch
   date, the ship month.
2. **Range clustering within partitions** (the open-format analog of
   OPTIMIZE ZORDER) — `repartitionByRange` + `sortWithinPartitions`
   gives each output file a narrow min/max band per cluster column, so
   parquet row-group statistics skip most files for point/range
   predicates. Right for high-cardinality columns (customer id, order
   id) where a directory per value is absurd.

Both are write-time decisions with zero read-side code: Catalyst uses
directory layout and footer stats automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "month",
    part_col: str = "part_date",
) -> None:
    """Materialize a date-partitioned layout from an event/fact table.

    `granularity` is any `date_trunc` unit; each truncated value
    becomes one `part_date=.../` directory. At 100 TB this is the
    difference between scanning 7 days and scanning 7 years for the
    daily-slice queries (P10/P11) — and retention (S10) and backfill
    (S12) become directory drops instead of rewrites.
    """
    with_part = df.withColumn(
        part_col, F.date_trunc(granularity, F.col(ts_col)).cast("date")
    )
    with_part.write.mode("overwrite").partitionBy(part_col).parquet(path)


def read_partition_range(
    spark: SparkSession,
    path: str,
    lo,
    hi,
    part_col: str = "part_date",
) -> DataFrame:
    """Scan only the partitions in [lo, hi] — the predicate lands in
    the scan's `PartitionFilters`, so non-matching directories are
    never listed into the plan (check `.explain("formatted")`)."""
    return spark.read.parquet(path).where(F.col(part_col).between(lo, hi))


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str | Column],
    n_files: int,
) -> None:
    """Range-cluster a table on high-cardinality columns.

    `repartitionByRange` samples the cluster key to cut `n_files`
    contiguous, non-overlapping key ranges; the within-partition sort
    tightens every parquet row group's min/max to a narrow band. A
    point or range predicate on the cluster key then prunes to ~1 file
    via footer stats alone — the lakehouse replacement for the
    reference's per-column B-trees. Size `n_files` so each file lands
    near the target scan unit (~128 MB-1 GB at cluster scale).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave the low `bits` of each
    column so sorting by ONE key gives file/row-group locality on ALL
    of them — what single-column range clustering cannot do (it orders
    the first column perfectly and scrambles the rest).

    Pure Column expressions (shifts/masks, JVM codegen, no UDF). Works
    on non-negative integral columns; rank-normalize skewed or signed
    columns first. bits × len(cols) must stay ≤ 63.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if bits * n > 63:
        raise ValueError("zorder_key: bits * len(cols) must be <= 63")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Z-order-cluster a table on several columns: range-partition and
    sort by the Morton key, drop the key at write. Every cluster
    column's per-file min/max band narrows (vs. one column for plain
    range clustering), so footer-stats pruning works for predicates on
    any of them."""
    zk = zorder_key(cluster_cols, bits)
    (
        df.withColumn("_zkey", zk)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of `column` per data file, from parquet footers only.

    This is the metadata a clustered layout is judged by: disjoint,
    narrow ranges mean row-group pruning works; full-width overlapping
    ranges mean every file must be read. Used by tests to prove the
    clustering contract without timing anything.
    """
    import pyarrow.parquet as pq

    ranges = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                return []
            mins.append(stats.min)
            maxs.append(stats.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges


def files_containing(ranges: list[tuple], key) -> int:
    """How many files' [min, max] bands contain `key` — the number of
    files a footer-stats-pruned point lookup must actually open."""
    return sum(1 for lo, hi in ranges if lo <= key <= hi)
