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


# ---- late-data semantics (synthetic lateness; testdata is ordered) ----


def _stage_batches(spark, base_dir, batches):
    """Write each logical batch as ONE parquet file with strictly
    increasing mtimes so the file source (maxFilesPerTrigger=1) replays
    them as separate micro-batches in order — the watermark then
    advances between batches exactly as it would on a live stream."""
    import glob
    import os
    import shutil

    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        EVENTS_STREAM_SCHEMA,
    )

    os.makedirs(base_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        staging = os.path.join(base_dir, f"_stg{i}")
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.parquet(
            staging
        )
        [part] = glob.glob(os.path.join(staging, "*.parquet"))
        dst = os.path.join(base_dir, f"batch{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(staging)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))


def test_stream_dedup_late_redelivery(spark, tmp_path):
    """Watermark = 1 h; re-deliveries split across micro-batches, with
    genuinely late rows in the final batch.

    The operator's contract (verified here against real watermark
    advancement, not ordered testdata): re-delivered keys are dropped —
    both while the original is within the watermark AND best-effort
    after it has aged out — while late-but-novel and out-of-order rows
    pass through (dropDuplicatesWithinWatermark bounds STATE, it is
    not an input late-filter; the windowed-aggregate test below covers
    the hard late-row drop)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, ts):
        return (eid, ts, 1, "view", 1.0, "{}")

    batches = [
        # batch 0: originals → watermark after: t0-50m
        [ev(1, t0), ev(2, t0 + timedelta(minutes=10))],
        # batch 1: dup of 1 within watermark (dropped) + clock advance
        # → watermark after: t0+2h
        [ev(1, t0), ev(3, t0 + timedelta(hours=3))],
        # batch 2 (watermark t0+2h):
        #   dup of 1 at t0        → still dropped (re-delivery)
        #   fresh event 4         → kept
        #   out-of-order 5 at 2h05 (above watermark) → kept
        #   late-but-novel 6 at 1h (below watermark) → kept: the
        #     operator does not filter late inputs
        [
            ev(1, t0),
            ev(4, t0 + timedelta(hours=3, minutes=10)),
            ev(5, t0 + timedelta(hours=2, minutes=5)),
            ev(6, t0 + timedelta(hours=1)),
        ],
    ]
    base = str(tmp_path / "late_in")
    _stage_batches(spark, base, batches)
    deduped = stream_dedup(read_event_stream(spark, base), watermark="1 hour")
    run_stream_to_memory(deduped, "late_out")
    rows = spark.sql("SELECT event_id FROM late_out").collect()
    got = sorted(r["event_id"] for r in rows)
    assert got == [1, 2, 3, 4, 5, 6], f"dedup semantics changed: {got}"
    assert got.count(1) == 1, "re-delivered key emitted twice"


def test_stream_windowed_agg_drops_beyond_watermark_rows(spark, tmp_path):
    """The windowed aggregate is where the watermark HARD-drops late
    rows: a row whose event time is below the watermark when it arrives
    must not resurrect an already-emitted window, while a late-but-
    above-watermark row is still accepted into its (open) window."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, ts):
        return (eid, ts, 1, "view", 1.0, "{}")

    batches = [
        # window [00:00,01:00): two rows
        [ev(1, t0 + timedelta(minutes=5)), ev(2, t0 + timedelta(minutes=20))],
        # advance clock → watermark t0+2h30 closes+emits [00:00,01:00)
        [ev(3, t0 + timedelta(hours=3, minutes=30))],
        # one more batch so the advanced watermark is committed into the
        # operator's late-row filter (the filter uses the watermark as
        # of the START of the batch; a row arriving in the same batch
        # the watermark jumps is still admitted — measured)
        [ev(9, t0 + timedelta(hours=3, minutes=31))],
        # late row at 00:40 (below watermark) → dropped pre-aggregation;
        # 02:40 (above watermark) → accepted into its open window
        [ev(4, t0 + timedelta(minutes=40)), ev(5, t0 + timedelta(hours=2, minutes=40))],
    ]
    base = str(tmp_path / "late_agg_in")
    _stage_batches(spark, base, batches)
    agg = stream_windowed_agg(read_event_stream(spark, base), watermark="1 hour")
    # append mode: only watermark-closed windows are emitted — exactly
    # the late-data contract under test
    q = (
        agg.writeStream.format("memory")
        .queryName("late_agg_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT window_start, n_events FROM late_agg_out ORDER BY window_start"
    ).collect()
    emitted = [(str(r["window_start"]), r["n_events"]) for r in rows]
    # one closed window, with the late row NOT counted
    assert emitted == [("2024-01-01 00:00:00", 2)], emitted


def test_foreach_batch_manifest_upsert_transactional(spark, stream_dir, tmp_path):
    """Streaming into the ACID manifest table: re-delivered keys
    don't duplicate, every micro-batch is a committed version, and
    time travel still sees the pre-stream snapshot."""
    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_manifest_upsert,
    )

    out = str(tmp_path / "silver_events_acid")
    t = ManifestTable(spark, out)
    # a batch writer seeds the table before the stream starts
    seed = table(spark, "/root/testdata/sf0.001", "events").orderBy(
        "event_id"
    ).limit(10).select("event_id", "user_id", "event_type", "ts")
    v_seed = t.append(seed)

    deduped = stream_dedup(read_event_stream(spark, stream_dir)).select(
        "event_id", "user_id", "event_type", "ts"
    )
    q = (
        deduped.writeStream.foreachBatch(
            foreach_batch_manifest_upsert(out, ["event_id"])
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_acid"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = t.read()
    # 200 distinct stream events; the 10 seeded rows overlap them by key
    assert got.count() == got.select("event_id").distinct().count() == 200
    # the stream committed at least one version on top of the seed
    assert t.current_version() > v_seed
    # time travel: the seed snapshot is intact underneath
    assert t.read(version=v_seed).count() == 10


def test_foreach_batch_incremental_view(spark, stream_dir, tmp_path):
    """Stream → ACID source manifest → change-feed-maintained gold
    aggregate: after the stream drains, the view equals a full
    recompute of the source, without ever rescanning it."""
    from doeecommerce_datapipeline_spark.sinks.incremental_view import (
        IncrementalView,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import (
        ManifestTable,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_incremental_view,
    )
    from pyspark.sql import functions as F

    src_path = str(tmp_path / "src_acid")
    view_path = str(tmp_path / "gold_view")
    events = stream_dedup(read_event_stream(spark, stream_dir)).select(
        "event_id", "event_type", "user_id"
    )
    q = (
        events.writeStream.foreachBatch(
            foreach_batch_incremental_view(
                src_path, view_path, ["event_type"], ["user_id"]
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_iv"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    src = ManifestTable(spark, src_path)
    iv = IncrementalView(
        spark, src, view_path, keys=["event_type"], sum_cols=["user_id"]
    )
    got = {
        r["event_type"]: (r["n_rows"], r["sum_user_id"])
        for r in iv.read().collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in src.read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))
        .collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == 200
    # the view advanced through the stream's commits, not one big one
    assert iv.last_applied() == src.current_version() >= 1


def test_stream_stream_interval_join_matches_batch(spark, stream_dir):
    """The online attribution join must produce exactly the rows the
    equivalent batch join produces once both streams drain."""
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        stream_stream_interval_join,
    )
    from pyspark.sql import functions as F

    clicks_s = read_event_stream(spark, stream_dir).where(
        F.col("event_type") == "click"
    ).dropDuplicates(["event_id"])
    views_s = read_event_stream(spark, stream_dir).where(
        F.col("event_type") == "view"
    ).dropDuplicates(["event_id"])
    # 30 days: the 200-event fixture is sparse per user, so a wide
    # attribution window guarantees the join actually fires
    joined = stream_stream_interval_join(
        clicks_s, views_s, max_delay_minutes=43200
    )
    run_stream_to_memory(joined, "ssj_out")
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT click_id || '-' || view_id) AS d"
        " FROM ssj_out"
    ).collect()[0]

    batch = spark.read.parquet(stream_dir).dropDuplicates(["event_id"])
    c = batch.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    v = batch.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts"),
    )
    expected = c.join(
        v,
        (F.col("user_id") == F.col("view_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr("INTERVAL 43200 MINUTES")
        ),
    ).count()
    assert got["n"] == got["d"] == expected
    assert expected > 0  # the fixture must actually exercise the join


def test_stream_session_windows_match_batch(spark, stream_dir):
    """The streaming dedup→session_window pipeline (complete mode over
    the drained stream) must produce the same sessions the batch
    dedup + session_window twin computes on the same rows — one
    'session' definition across batch and streaming, with the online
    dedup absorbing the fixture's 50 re-deliveries. Chaining two
    stateful operators exercises multi-stateful support; the dedup
    stage owns the watermark (watermark=None downstream)."""
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        stream_session_agg,
    )

    agg = stream_session_agg(
        stream_dedup(read_event_stream(spark, stream_dir)), watermark=None
    )
    run_stream_to_memory(agg, "sess_out", output_mode="complete")
    got = {
        (r.user_id, str(r.session_start), str(r.session_end)): (
            r.n_events,
            r.session_value,
        )
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # batch twin: dedup (as the streaming graph does online) then the
    # identical session_window aggregate
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(stream_dir)
        .dropDuplicates(["event_id"])
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v"),
        )
    )
    want = {
        (r.user_id, str(r["session_window"]["start"]), str(r["session_window"]["end"])): (
            r.n,
            r.v,
        )
        for r in batch.collect()
    }
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, stream_dir):
    """Stream-static broadcast enrichment must equal the same left join
    run in batch over the drained rows."""
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        stream_enrich_with_dim,
    )

    cust = table(spark, "/root/testdata/sf0.001", "customer")
    nat = table(spark, "/root/testdata/sf0.001", "nation")
    dim = cust.join(nat, cust.c_nationkey == nat.n_nationkey).select(
        F.col("c_custkey").alias("user_id"),
        F.col("n_name").alias("nation_name"),
    )
    enriched = stream_enrich_with_dim(read_event_stream(spark, stream_dir), dim)
    run_stream_to_memory(enriched, "enrich_out")
    got = {
        (r.event_id, r.nation_name)
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    want = {
        (r.event_id, r.nation_name)
        for r in spark.read.parquet(stream_dir)
        .join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "nation_name")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_pii_redact_equals_batch(spark, tmp_path):
    """Streaming redaction over file micro-batches is row-identical to
    the batch pass on the same directory (stateless projection — the
    strongest batch≡stream contract in the repo)."""
    from doeecommerce_datapipeline_spark.operators.pii import (
        pii_redact,
        synth_crm_notes,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        stream_pii_redact,
    )

    src = synth_crm_notes(spark, "/root/testdata/sf0.001").select(
        "c_custkey", "note"
    )
    d = str(tmp_path / "notes_in")
    src.limit(100).write.parquet(d)
    src.orderBy("c_custkey").limit(150).write.mode("append").parquet(d)

    stream = spark.readStream.schema(src.schema).parquet(d)
    run_stream_to_memory(
        stream_pii_redact(stream, "c_custkey", "note"), "pii_out"
    )
    got = {
        (r["c_custkey"], r["clean_text"], r["n_redactions"])
        for r in spark.sql("SELECT * FROM pii_out").collect()
    }
    want = {
        (r["c_custkey"], r["clean_text"], r["n_redactions"])
        for r in pii_redact(
            spark.read.parquet(d), "c_custkey", "note"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_media_decode_equals_batch(spark, tmp_path):
    """Streaming media decode over file micro-batches is row-identical
    to the batch codec pass on the same directory — including through
    BOTH real image decoders, JPEG (r7) and PNG (r8), dispatched by
    payload magic per micro-batch (stateless mapInPandas projection;
    the multimodal twin of the pii stream contract)."""
    import numpy as np

    from doeecommerce_datapipeline_spark.multimodal.decode import (
        decode_media,
    )
    from doeecommerce_datapipeline_spark.multimodal.jpeg import (
        encode_baseline_jpeg,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        stream_media_decode,
    )

    from doeecommerce_datapipeline_spark.multimodal.png import (
        encode_png,
    )

    rows = []
    for mid in range(1, 9):
        rng = np.random.default_rng(mid)
        img = rng.integers(0, 256, (8 + mid, 10, 3), dtype=np.uint8)
        # alternate containers: the stream must dispatch BOTH real
        # codecs (JPEG r7, PNG r8) per micro-batch
        if mid % 2:
            payload = bytearray(encode_baseline_jpeg(img, 90))
            mime = "image/jpeg"
        else:
            payload = bytearray(encode_png(img))
            mime = "image/png"
        rows.append((mid, "image", mime, payload, None))
    schema = (
        "media_id long, kind string, mime string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:long>"
    )
    src = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "media_in")
    src.limit(5).write.parquet(d)
    src.write.mode("append").parquet(d)

    stream = spark.readStream.schema(src.schema).parquet(d)
    run_stream_to_memory(
        stream_media_decode(stream, real_decode=True), "media_out"
    )
    got = {
        (r["media_id"], r["n_bytes"], r["sha256"], tuple(r["features"]))
        for r in spark.sql("SELECT * FROM media_out").collect()
    }
    want = {
        (r["media_id"], r["n_bytes"], r["sha256"], tuple(r["features"]))
        for r in decode_media(
            spark.read.parquet(d), real_decode=True
        ).collect()
    }
    assert got == want and len(got) > 0
