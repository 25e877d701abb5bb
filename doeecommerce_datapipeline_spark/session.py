"""SparkSession factory tuned for the local[N] test/bench environment.

At cluster scale the same builder settings apply, except
``spark.sql.shuffle.partitions`` should track total executor cores and
AQE coalescing handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "doeecommerce_datapipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing + skew-join splitting.
    - Session timezone pinned to UTC so date extraction agrees with
      timezone-naive engines (parquet timestamps are naive).
    - Arrow on: fast toPandas / pandas_udf transfer.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local testdata ships as one small parquet file per table — at
        # the default 128MB/4MB (maxPartitionBytes/openCost) every scan
        # lands in ONE task and heavy per-row ops run single-threaded.
        # A fine split grain restores full-core scans here; production
        # deployments override via env (128MB+ is right at 100 TB).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", "0")
        # runtime row-group pruning on selective joins: build a Bloom
        # filter from the small side and push it into the big side's
        # scan — free at local SF, a major scan cut on 100 TB star
        # joins (the manifest store's file-level Blooms prune FILES;
        # this prunes row groups inside surviving files)
        # (semiJoinReduction rewrite NOT enabled: on this Spark build
        # flipping it on hangs planning of even trivial actions — the
        # bloom-filter variant alone is the production-proven path)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_oracle_compat(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs needed for DuckDB-oracle agreement on a
    session we did not build (the driver passes its own).

    UTC session timezone makes ``to_date(timestamp)`` agree with
    timezone-naive engines reading the same parquet.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
