"""applyInPandasWithState sessionizer: closed sessions match the batch
lag+cumsum sessionizer on the same data."""

import pytest

from doeecommerce_datapipeline_spark.io import table
from doeecommerce_datapipeline_spark.operators.events import session_stats
from doeecommerce_datapipeline_spark.streaming.stateful import sessionize_stream
from doeecommerce_datapipeline_spark.streaming.stream_ops import (
    read_event_stream,
    run_stream_to_memory,
)


@pytest.fixture(scope="module")
def stateful_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stateful")
    src = table(spark, "/root/testdata/sf0.001", "events")
    base = str(d / "in")
    src.write.parquet(base)
    return base


def test_stateful_sessions_match_batch(spark, stateful_dir):
    stream = sessionize_stream(read_event_stream(spark, stateful_dir))
    run_stream_to_memory(stream, "sessions_out")
    online = spark.sql(
        "SELECT user_id, session_start, n_events FROM sessions_out"
    ).collect()
    assert online, "no sessions closed"

    batch = session_stats(spark, "/root/testdata/sf0.001")
    batch_keys = {
        (r["user_id"], r["session_start"].replace(microsecond=0), r["n_events"])
        for r in batch.collect()
    }
    online_keys = {
        (r["user_id"], r["session_start"].replace(microsecond=0), r["n_events"])
        for r in online
    }
    # every closed online session must be a batch session (final open
    # sessions flush only on timeout, so online ⊆ batch)
    missing = online_keys - batch_keys
    assert not missing, f"online-only sessions: {sorted(missing)[:5]}"
    # and the stream must have closed most sessions (all but ≤1 open per user)
    assert len(online_keys) >= len(batch_keys) - 15
