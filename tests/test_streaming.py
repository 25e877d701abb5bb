"""Structured Streaming smoke tests driven by file micro-batches."""

import pytest

from doeecommerce_datapipeline_spark.io import table
from doeecommerce_datapipeline_spark.streaming.stream_ops import (
    foreach_batch_upsert,
    read_event_stream,
    run_stream_to_memory,
    stream_dedup,
    stream_windowed_agg,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """events restaged (µs timestamps via io.table) as a streaming
    directory, with a re-delivered slice to exercise online dedup."""
    d = tmp_path_factory.mktemp("stream")
    src = table(spark, "/root/testdata/sf0.001", "events")
    base = str(d / "in")
    first = src.orderBy("event_id").limit(200)
    first.write.parquet(base)
    first.orderBy("event_id").limit(50).write.mode("append").parquet(base)
    return base


def test_stream_dedup_drops_redelivery(spark, stream_dir):
    deduped = stream_dedup(read_event_stream(spark, stream_dir))
    run_stream_to_memory(deduped, "dedup_out")
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out"
    ).collect()[0]
    assert got["n"] == got["d"] == 200  # 250 arrived, 50 were re-deliveries


def test_stream_windowed_agg(spark, stream_dir):
    agg = stream_windowed_agg(read_event_stream(spark, stream_dir))
    run_stream_to_memory(agg, "win_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM win_out").collect()
    assert rows
    assert all(r["window_end"] > r["window_start"] for r in rows)


def test_foreach_batch_upsert(spark, stream_dir, tmp_path):
    out = str(tmp_path / "silver_events")
    deduped = stream_dedup(read_event_stream(spark, stream_dir)).select(
        "event_id", "user_id", "event_type", "ts"
    )
    q = (
        deduped.writeStream.foreachBatch(foreach_batch_upsert(out, ["event_id"]))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == got.select("event_id").distinct().count() == 200
