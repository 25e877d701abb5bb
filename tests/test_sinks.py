"""Mutation-sink semantics (S6–S12): upsert, retention, archive,
backfill window replace."""

from datetime import datetime

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.sinks.parquet_sinks import (
    append,
    archive,
    backfill_replace_range,
    retention_delete,
    upsert,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, ts timestamp")


def test_upsert_replaces_matching_keys(spark, tmp_path):
    p = str(tmp_path / "t")
    _df(spark, [(1, "a", datetime(2024, 1, 1)), (2, "b", datetime(2024, 1, 2))]).write.parquet(p)
    upsert(spark, _df(spark, [(2, "B", datetime(2024, 1, 3)), (3, "c", datetime(2024, 1, 4))]), p, ["id"])
    got = {r["id"]: r["val"] for r in spark.read.parquet(p).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_upsert_creates_when_missing(spark, tmp_path):
    p = str(tmp_path / "new")
    upsert(spark, _df(spark, [(1, "a", datetime(2024, 1, 1))]), p, ["id"])
    assert spark.read.parquet(p).count() == 1


def test_retention_delete(spark, tmp_path):
    p = str(tmp_path / "ret")
    _df(
        spark,
        [(1, "old", datetime(2024, 1, 1)), (2, "new", datetime(2024, 1, 20))],
    ).write.parquet(p)
    deleted = retention_delete(spark, p, "ts", keep_days=7, now=datetime(2024, 1, 21))
    assert deleted == 1
    assert [r["id"] for r in spark.read.parquet(p).collect()] == [2]


def test_archive_moves_rows(spark, tmp_path):
    p, ap = str(tmp_path / "t"), str(tmp_path / "arch")
    _df(
        spark,
        [(1, "old", datetime(2024, 1, 1)), (2, "new", datetime(2024, 1, 20))],
    ).write.parquet(p)
    n = archive(spark, p, ap, "ts", datetime(2024, 1, 10))
    assert n == 1
    assert spark.read.parquet(p).count() == 1
    assert spark.read.parquet(ap).collect()[0]["id"] == 1


def test_backfill_replace_range(spark, tmp_path):
    p = str(tmp_path / "bf")
    _df(
        spark,
        [
            (1, "jan1", datetime(2024, 1, 1, 5)),
            (2, "jan2", datetime(2024, 1, 2, 5)),
            (3, "jan3", datetime(2024, 1, 3, 5)),
        ],
    ).write.parquet(p)
    new = _df(spark, [(9, "jan2-redo", datetime(2024, 1, 2, 9))])
    backfill_replace_range(
        spark, new, p, "ts", datetime(2024, 1, 2), datetime(2024, 1, 3)
    )
    got = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert got == [1, 3, 9]


def test_append_partitioned(spark, tmp_path):
    p = str(tmp_path / "part")
    df = _df(spark, [(1, "a", datetime(2024, 1, 1))]).withColumn(
        "dt", F.to_date("ts")
    )
    append(df, p, partition_by=["dt"])
    append(df, p, partition_by=["dt"])
    assert spark.read.parquet(p).count() == 2
