"""Date-partitioned lakehouse layout: writes partitioned by date and
verifies dynamic partition pruning reaches the scan — the 100 TB story
for every P10/P11 daily-slice predicate."""

import io
import contextlib

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.io import table


def test_date_partitioned_write_prunes_scan(spark, tmp_path):
    p = str(tmp_path / "events_by_day")
    e = table(spark, "/root/testdata/sf0.001", "events")
    e.withColumn("dt", F.to_date("ts")).write.partitionBy("dt").parquet(p)

    df = spark.read.parquet(p).where(F.col("dt") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan  # the filter prunes partitions, not rows

    n = df.count()
    direct = e.where(F.to_date("ts") == "2024-01-05").count()
    assert n == direct > 0


def test_partitioned_append_is_incremental(spark, tmp_path):
    """The daily-batch pattern: each day's append touches only its own
    partition directory."""
    import os

    p = str(tmp_path / "daily")
    e = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "dt", F.to_date("ts")
    )
    day1 = e.where(F.col("dt") == "2024-01-05")
    day2 = e.where(F.col("dt") == "2024-01-06")
    day1.write.partitionBy("dt").parquet(p)
    day2.write.mode("append").partitionBy("dt").parquet(p)
    dirs = {d for d in os.listdir(p) if d.startswith("dt=")}
    assert dirs == {"dt=2024-01-05", "dt=2024-01-06"}
    assert spark.read.parquet(p).count() == day1.count() + day2.count()
