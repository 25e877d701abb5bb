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


def test_late_stream_upsert_matches_batch_latest_wins(spark, tmp_path):
    """E2E tying the late-data stream fixtures to the ACID sink: the
    SAME out-of-order micro-batches, driven through both streaming
    publishers, must show (a) latest-wins converging to the batch
    answer and (b) last-batch-wins diverging on the stale redelivery —
    the contract that motivates ``upsert_latest_wins``."""
    from datetime import datetime, timedelta

    from test_streaming import _stage_batches

    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_latest_wins_upsert,
        foreach_batch_manifest_upsert,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, ts, val):
        return (eid, ts, 1, "view", val, "{}")

    batches = [
        # batch 0: first versions of keys 1 and 2
        [ev(1, t0, 1.0), ev(2, t0 + timedelta(minutes=10), 1.0)],
        # batch 1: key 1 updated (newer), key 3 appears
        [ev(1, t0 + timedelta(hours=1), 2.0), ev(3, t0, 1.0)],
        # batch 2: STALE redeliveries of 1 and 2 (older ts — must not
        # clobber), novel-late key 4, fresh update of key 3
        [
            ev(1, t0, 9.0),
            ev(2, t0 + timedelta(minutes=5), 9.0),
            ev(4, t0, 1.0),
            ev(3, t0 + timedelta(hours=2), 2.0),
        ],
    ]
    base = str(tmp_path / "late_upsert_in")
    _stage_batches(spark, base, batches)

    def drive(sink_fn, out_name):
        q = (
            read_event_stream(spark, base)
            .writeStream.foreachBatch(sink_fn)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{out_name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    lw_path = str(tmp_path / "tbl_latest_wins")
    drive(foreach_batch_latest_wins_upsert(lw_path, ["event_id"], "ts"), "lw")

    lbw_path = str(tmp_path / "tbl_last_batch_wins")
    drive(foreach_batch_manifest_upsert(lbw_path, ["event_id"]), "lbw")

    # batch latest-wins oracle over ALL input rows, computed in-memory
    flat = [r for b in batches for r in b]
    expect = {}
    for eid, ts, _u, _t, val, _p in flat:
        if eid not in expect or ts > expect[eid][0]:
            expect[eid] = (ts, val)

    got = {
        r["event_id"]: (r["ts"], r["value"])
        for r in ManifestTable(spark, lw_path).read().collect()
    }
    assert got == expect, f"latest-wins diverged from batch answer: {got}"

    # the plain publisher took the stale batch-2 rows — shows WHY the
    # conditional merge exists (key 1 regressed to the t0 redelivery)
    naive = {
        r["event_id"]: (r["ts"], r["value"])
        for r in ManifestTable(spark, lbw_path).read().collect()
    }
    assert naive[1] == (t0, 9.0)
    assert naive != expect

    # replay idempotency: re-upserting the whole input changes nothing
    all_rows = spark.createDataFrame(
        flat, ManifestTable(spark, lw_path).read().schema
    )
    ManifestTable(spark, lw_path).upsert_latest_wins(all_rows, ["event_id"], "ts")
    again = {
        r["event_id"]: (r["ts"], r["value"])
        for r in ManifestTable(spark, lw_path).read().collect()
    }
    assert again == expect


def test_streaming_near_dedup_corpus_ingest(spark, tmp_path):
    """Online crawl-ingest: document micro-batches dedup against the
    persistent LSH index as they stream in — later batches drop near-
    dups of EARLIER batches' survivors, the corpus table accumulates
    only novel content."""
    import glob
    import os
    import shutil

    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_near_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry heavy wooden crates across the shallow "
        "river during a long summer afternoon near the old mill"
    )
    other = (
        "completely different content about distributed query engines "
        "optimizing shuffle partitions and broadcast joins under heavy "
        "skew with adaptive execution and columnar parquet scans"
    )
    batches = [
        [(1, base), (2, other)],
        # near-dup of batch-1's doc 1 (known band collision: mill→barn)
        # + a novel doc
        [(10, base.replace("mill", "barn")), (11, "totally novel text about "
          "byzantine consensus protocols with quorum intersection and "
          "log replication across partitioned replicas everywhere")],
    ]
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        stg = str(tmp_path / f"_s{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
        shutil.rmtree(stg)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_near_dedup(
                str(tmp_path / "lsh_idx"), str(tmp_path / "corpus")
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    corpus = ManifestTable(spark, str(tmp_path / "corpus")).read()
    assert sorted(r["doc_id"] for r in corpus.collect()) == [1, 2, 11]


def test_velocity_alerts_match_batch_rule(spark, tmp_path):
    """The stateful velocity alert fires exactly where a batch replay
    of the same rule fires — including a burst SPLIT ACROSS
    micro-batches (the case that needs real cross-batch state)."""
    from datetime import datetime, timedelta

    from test_streaming import _stage_batches

    from doeecommerce_datapipeline_spark.streaming.stateful import (
        velocity_alert_stream,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, ts):
        return (eid, ts, user, "view", 1.0, "{}")

    batches = [
        # user 1: two events — below threshold so far
        [ev(1, 1, t0), ev(2, 1, t0 + timedelta(seconds=10))],
        # user 1: third event 20s in → alert (burst spans batches);
        # user 2: three events spread over 3 minutes → NO alert
        [
            ev(3, 1, t0 + timedelta(seconds=20)),
            ev(4, 2, t0),
            ev(5, 2, t0 + timedelta(seconds=90)),
            ev(6, 2, t0 + timedelta(seconds=170)),
        ],
        # user 1 again: after the re-arm, a fresh 3-burst → second alert
        [
            ev(7, 1, t0 + timedelta(seconds=300)),
            ev(8, 1, t0 + timedelta(seconds=301)),
            ev(9, 1, t0 + timedelta(seconds=302)),
        ],
    ]
    base = str(tmp_path / "vel_in")
    _stage_batches(spark, base, batches)
    alerts = velocity_alert_stream(read_event_stream(spark, base))
    run_stream_to_memory(alerts, "vel_out")
    rows = sorted(
        spark.sql("SELECT user_id, alert_ts FROM vel_out").collect(),
        key=lambda r: (r["user_id"], r["alert_ts"]),
    )
    assert [(r["user_id"], r["alert_ts"]) for r in rows] == [
        (1, t0 + timedelta(seconds=20)),
        (1, t0 + timedelta(seconds=302)),
    ]


def test_online_peak_concurrency_matches_batch(spark, tmp_path):
    """E2E: stateful sessionizer → foreach_batch_session_sweep keeps an
    ACID per-day peak-concurrency table that, after draining an
    out-of-order event stream, EQUALS the batch sweep over the same
    events — the online face of peak_concurrent_sessions. A sentinel
    far-future event per user closes the final open sessions (the
    bounded-run alternative to the processing-time timeout); sentinel
    sessions themselves never close, so they never enter the table."""
    from datetime import datetime, timedelta

    from test_streaming import _stage_batches

    from doeecommerce_datapipeline_spark.operators.events import (
        peak_concurrency_by_day,
        session_stats,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_session_sweep,
        read_event_stream,
    )
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + timedelta(minutes=minutes), uid, "view", 1.0, "{}")

    batches = [
        [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5)],
        # u2@00:15 arrives AFTER u1@02:00 — out-of-order across users
        [ev(4, 1, 20), ev(5, 1, 120), ev(6, 2, 15)],
        [ev(7, 2, 180), ev(8, 1, 125)],
        # sentinel: closes each user's final open session
        [ev(98, 1, 60 * 24 * 10), ev(99, 2, 60 * 24 * 10)],
    ]
    base = str(tmp_path / "sweep_in")
    _stage_batches(spark, base, batches)

    sessions_path = str(tmp_path / "sessions_tbl")
    peaks_path = str(tmp_path / "peaks_tbl")
    q = (
        sessionize_stream(read_event_stream(spark, base))
        .writeStream.foreachBatch(
            foreach_batch_session_sweep(sessions_path, peaks_path)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sweep"))
        .option("maxFilesPerTrigger", 1)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # batch twin over the same REAL events (sentinels excluded)
    real = [r for b in batches[:3] for r in b]
    sf_like = str(tmp_path / "batch_sf")
    spark.createDataFrame(
        real,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.parquet(sf_like + "/events.parquet")
    batch_sessions = session_stats(spark, sf_like).select(
        "user_id",
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
    )
    want_sessions = {
        (r.user_id, r.s_start, r.s_end) for r in batch_sessions.collect()
    }
    got_sessions = {
        (r.user_id, r.session_start, r.session_end)
        for r in ManifestTable(spark, sessions_path).read().collect()
    }
    assert got_sessions == want_sessions

    want_peaks = {
        (r.day, r.carry_in, r.peak_concurrency)
        for r in peak_concurrency_by_day(batch_sessions).collect()
    }
    got_peaks = {
        (r.day, r.carry_in, r.peak_concurrency)
        for r in ManifestTable(spark, peaks_path).read().collect()
    }
    assert got_peaks == want_peaks
    # and the fixture actually overlaps: the day's peak is 2, not 1
    assert max(p for _, _, p in got_peaks) == 2


def test_online_ewma_matches_batch_recursion(spark, tmp_path):
    """E2E: the daily-revenue series replayed as out-of-order-free
    micro-batches through the stateful online EWMA equals the batch
    recursive operator BIT-FOR-BIT, and a stale redelivery in a later
    batch is dropped instead of corrupting the recursion."""
    import glob
    import os
    import shutil
    import time

    from doeecommerce_datapipeline_spark.operators.windows import (
        ewma_recursive_daily,
    )
    from doeecommerce_datapipeline_spark.streaming.stateful import ewma_stream

    sf = "/root/testdata/sf0.001"
    batch = sorted(
        ewma_recursive_daily(spark, sf).collect(), key=lambda r: r.day
    )
    series = [
        ("revenue", i, r.revenue) for i, r in enumerate(batch)
    ]
    third = len(series) // 3
    batches = [
        series[:third],
        series[third: 2 * third] + [series[5]],  # stale redelivery
        series[2 * third:],
    ]
    base = str(tmp_path / "ewma_in")
    os.makedirs(base, exist_ok=True)
    for i, rows in enumerate(batches):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(
            rows, "key string, seq long, x double"
        ).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(base, f"batch{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stg)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema("key string, seq long, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["seq"]: r["ewma"]
        for r in spark.sql("SELECT seq, ewma FROM ewma_out").collect()
    }
    assert len(got) == len(series)  # stale row emitted nothing extra
    for i, r in enumerate(batch):
        assert got[i] == r.ewma, f"seq {i}: {got[i]} != {r.ewma}"


def test_online_psi_bins_match_batch_drift(spark, tmp_path):
    """E2E: a 3-file replay of the events fixture through
    foreach_batch_psi_bins accumulates EXACTLY the batch binning —
    and the PSI computed from the drained table is bit-identical to
    value_psi_drift's on the same rows (the frozen-reference-binning
    contract makes online and batch definitionally the same sums)."""
    import math

    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.io import table
    from doeecommerce_datapipeline_spark.operators.profiling import (
        value_psi_drift,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import (
        ManifestTable,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_psi_bins,
        read_event_stream,
    )

    sf = "/root/testdata/sf0.001"
    src = table(spark, sf, "events")
    b = src.agg(
        F.min(F.unix_micros("ts")).alias("t_lo"),
        F.max(F.unix_micros("ts")).alias("t_hi"),
        F.min("value").alias("v_lo"),
        F.max("value").alias("v_hi"),
    ).collect()[0]
    base = str(tmp_path / "psi_in")
    n = src.count()
    step = n // 3 + 1
    for lo in range(0, n, step):
        src.orderBy("event_id").offset(lo).limit(step).write.mode(
            "append"
        ).parquet(base)
    bins_path = str(tmp_path / "psi_bins")
    sink = foreach_batch_psi_bins(
        bins_path,
        v_lo=b.v_lo,
        v_hi=b.v_hi,
        t_bound_2x_us=b.t_lo + b.t_hi,  # exact-integer midpoint seam
    )
    q = (
        read_event_stream(spark, base)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "psi_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.bin, r.half): r.n
        for r in ManifestTable(spark, bins_path).read().collect()
    }
    # reference: the batch operator's internal binning on the same rows
    width = (b.v_hi - b.v_lo) / 10.0
    want = {}
    for r in src.select("value", F.unix_micros("ts").alias("t")).collect():
        bin_ = min(int(math.floor((r.value - b.v_lo) / width)), 9)
        half = 0 if r.t * 2 <= b.t_lo + b.t_hi else 1
        want[(bin_, half)] = want.get((bin_, half), 0) + 1
    assert got == want
    # and the PSI from these counts equals the batch operator's
    [batch_row] = value_psi_drift(spark, sf).collect()
    def share(d, half, b_):
        tot = sum(v for (bb, h), v in d.items() if h == half)
        return max(d.get((b_, half), 0) / tot, 1e-6)
    psi = 0.0
    from decimal import Decimal
    acc = Decimal(0)
    for b_ in range(10):
        p, qq = share(got, 0, b_), share(got, 1, b_)
        acc += Decimal(str(round((p - qq) * math.log(p / qq), 9)))
    assert float(acc) == batch_row.psi


def test_online_funnel_depth_matches_batch(spark, tmp_path):
    """E2E: events replayed in timestamp order as 3 micro-batches
    (with a planted stale redelivery) through the stateful online
    windowFunnel; the final per-user depths must reproduce the batch
    operator's histogram exactly."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.io import table
    from doeecommerce_datapipeline_spark.operators.events import (
        window_funnel_depth,
    )
    from doeecommerce_datapipeline_spark.streaming.stateful import (
        funnel_depth_stream,
    )

    sf = "/root/testdata/sf0.001"
    src = (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("ts", "event_id")
        .collect()
    )
    third = len(src) // 3
    batches = [
        src[:third],
        src[third: 2 * third] + [src[5]],  # stale redelivery
        src[2 * third:],
    ]
    base = str(tmp_path / "wf_in")
    os.makedirs(base, exist_ok=True)
    for i, rows in enumerate(batches):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp,"
            " event_type string",
        ).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(base, f"batch{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stg)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp,"
            " event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        funnel_depth_stream(stream)
        .writeStream.format("memory")
        .queryName("wf_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "wf_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # depth is monotone per user, so the final value is the max emitted
    got = {
        r.user_id: r.mx
        for r in spark.sql(
            "SELECT user_id, MAX(depth) AS mx FROM wf_out GROUP BY 1"
        ).collect()
    }
    hist = {}
    for d in got.values():
        hist[d] = hist.get(d, 0) + 1
    want = {
        r.depth: r.n_users
        for r in window_funnel_depth(spark, sf).collect()
    }
    assert hist == want


def test_online_space_saving_heavy_hitters(spark, tmp_path):
    """E2E: events replayed in 3 micro-batches through the stateful
    space-saving summary. The final snapshot per group must satisfy
    the sketch's hard guarantees against exact batch counts: every
    user with true count > n/k is present, and every reported count
    brackets the truth via its certified error bound. A second pass
    with k large enough to hold every item must be EXACT (err 0)."""
    import glob
    import os
    import shutil
    import time

    from doeecommerce_datapipeline_spark.streaming.stateful import (
        SPACE_SAVING_K,
        space_saving_stream,
    )

    sf = "/root/testdata/sf0.001"
    ev = sorted(
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_type", "user_id", "event_id")
        .collect(),
        key=lambda r: r.event_id,
    )
    series = [
        (r.event_type, str(r.user_id), i) for i, r in enumerate(ev)
    ]
    third = len(series) // 3
    batches = [
        series[:third],
        series[third: 2 * third],
        series[2 * third:],
    ]

    def _drain(kval, name):
        base = str(tmp_path / f"ss_in_{name}")
        os.makedirs(base, exist_ok=True)
        for i, rows in enumerate(batches):
            stg = os.path.join(base, f"_stg{i}")
            spark.createDataFrame(
                rows, "grp string, item string, seq long"
            ).coalesce(1).write.parquet(stg)
            [part] = glob.glob(os.path.join(stg, "*.parquet"))
            dst = os.path.join(base, f"batch{i}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(stg)
            os.utime(dst, (time.time() + i, time.time() + i))
        stream = (
            spark.readStream.schema("grp string, item string, seq long")
            .option("maxFilesPerTrigger", 1)
            .parquet(base)
        )
        q = (
            space_saving_stream(stream, k=kval)
            .writeStream.format("memory")
            .queryName(f"ss_out_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ss_ck_{name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql(
            f"SELECT * FROM ss_out_{name}"
        ).collect()
        final = {}
        for r in rows:
            if (
                r.grp not in final
                or r.version > final[r.grp][0].version
            ):
                final.setdefault(r.grp, [])
            if r.version >= max(
                (x.version for x in final[r.grp]), default=-1
            ):
                final[r.grp] = [
                    x for x in final[r.grp] if x.version == r.version
                ] + [r]
        return final

    truth: dict = {}
    for g, it, _ in series:
        truth.setdefault(g, {})
        truth[g][it] = truth[g].get(it, 0) + 1

    final = _drain(SPACE_SAVING_K, "k20")
    for g, snap in final.items():
        n = sum(truth[g].values())
        assert snap[0].n_seen == n
        assert len(snap) <= SPACE_SAVING_K
        reported = {r.item: r for r in snap}
        for it, c in truth[g].items():
            if c > n / SPACE_SAVING_K:
                assert it in reported, (g, it, c)
        for r in snap:
            t = truth[g].get(r.item, 0)
            assert t <= r.count_est, (g, r.item)
            assert r.count_est - r.err_bound <= t, (g, r.item)

    exact = _drain(500, "big")
    for g, snap in exact.items():
        assert {r.item: r.count_est for r in snap} == truth[g]
        assert all(r.err_bound == 0 for r in snap)


def test_online_markov_counts_match_batch(spark, tmp_path):
    """E2E: events replayed in timestamp order as 3 micro-batches
    (with a planted stale redelivery) through the stateful online
    Markov counter; each user's final snapshot summed across users
    must reproduce the batch transition matrix exactly."""
    import glob
    import json
    import os
    import shutil
    import time

    from doeecommerce_datapipeline_spark.io import table
    from doeecommerce_datapipeline_spark.operators.events import (
        markov_transitions,
    )
    from doeecommerce_datapipeline_spark.streaming.stateful import (
        markov_stream,
    )

    sf = "/root/testdata/sf0.001"
    src = (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("ts", "event_id")
        .collect()
    )
    third = len(src) // 3
    batches = [
        src[:third],
        src[third: 2 * third] + [src[7]],  # stale redelivery
        src[2 * third:],
    ]
    base = str(tmp_path / "mk_in")
    os.makedirs(base, exist_ok=True)
    for i, rows in enumerate(batches):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(
            rows,
            "user_id long, event_id long, ts timestamp,"
            " event_type string",
        ).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(base, f"batch{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stg)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp,"
            " event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        markov_stream(stream)
        .writeStream.format("memory")
        .queryName("mk_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "mk_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT user_id, counts FROM mk_out a WHERE version ="
        " (SELECT MAX(version) FROM mk_out b"
        "  WHERE b.user_id = a.user_id)"
    ).collect()
    online = {}
    for r in rows:
        for k, v in json.loads(r.counts).items():
            online[tuple(k.split(" "))] = (
                online.get(tuple(k.split(" ")), 0) + v
            )
    batch = {
        (r.event_type, r.next_type): r.n_trans
        for r in markov_transitions(spark, sf).collect()
    }
    assert online == batch


def test_alert_suppression_cooldown(spark, tmp_path):
    """First alert passes, repeats inside the 10-min cooldown are
    swallowed and counted, the first after re-arm carries the count —
    including across micro-batch boundaries (state persists)."""
    import glob
    import os
    import shutil
    import time as _time

    from doeecommerce_datapipeline_spark.streaming.stateful import (
        alert_suppression_stream,
    )

    rows1 = [
        ("k1", "2024-01-01 10:00:00"),
        ("k1", "2024-01-01 10:03:00"),  # suppressed
        ("k1", "2024-01-01 10:08:00"),  # suppressed
    ]
    rows2 = [
        ("k1", "2024-01-01 10:12:00"),  # > 10 min after 10:00 -> emits
        ("k2", "2024-01-01 10:12:30"),  # new key -> emits
    ]
    base = str(tmp_path / "al_in")
    os.makedirs(base, exist_ok=True)
    for i, rows in enumerate([rows1, rows2]):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(
            rows, "alert_key string, ts string"
        ).selectExpr(
            "alert_key", "CAST(ts AS TIMESTAMP) AS ts"
        ).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(base, f"b{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stg)
        os.utime(dst, (_time.time() + i, _time.time() + i))
    stream = (
        spark.readStream.schema("alert_key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        alert_suppression_stream(stream)
        .writeStream.format("memory")
        .queryName("al_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "al_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [
        (r.alert_key, r.ts.strftime("%H:%M"), r.n_suppressed)
        for r in spark.sql(
            "SELECT * FROM al_out ORDER BY alert_key, ts"
        ).collect()
    ]
    assert got == [
        ("k1", "10:00", 0),
        ("k1", "10:12", 2),  # the two swallowed alerts are accounted
        ("k2", "10:12", 0),
    ]


def test_online_weighted_reservoir_matches_batch_sample(spark, tmp_path):
    """E2E: documents replayed as micro-batches (with a duplicate
    redelivery) through the online A-ES reservoir; the drained
    reservoir equals the batch weighted_doc_sample row-for-row —
    the semilattice merge identity top(A ∪ B) = top(top(A) ∪ B)."""
    import glob
    import os
    import shutil
    import time

    from doeecommerce_datapipeline_spark.operators.corpus import (
        weighted_doc_sample,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_weighted_reservoir,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").collect()
    third = len(docs) // 3
    batches = [
        docs[:third],
        docs[third: 2 * third] + docs[:5],  # replayed docs: no-op
        docs[2 * third:],
    ]
    base = str(tmp_path / "res_in")
    os.makedirs(base, exist_ok=True)
    schema = ("doc_id long, text string, lang string, source string,"
              " n_chars long")
    for i, rows in enumerate(batches):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        dst = os.path.join(base, f"batch{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stg)
        os.utime(dst, (time.time() + i, time.time() + i))

    res_path = str(tmp_path / "reservoir_tbl")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_weighted_reservoir(res_path)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "res_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    from doeecommerce_datapipeline_spark.sinks.manifest_store import (
        ManifestTable,
    )

    online = {
        (r.source, r.doc_id): (r.n_chars, r.rnk)
        for r in ManifestTable(spark, res_path).read().collect()
    }
    batch = {
        (r.source, r.doc_id): (r.n_chars, r.rnk)
        for r in weighted_doc_sample(spark, sf).collect()
    }
    assert online == batch


def test_online_moments_anova_matches_batch(spark, tmp_path):
    """E2E: events replayed as micro-batches through the additive
    moments state; ANOVA closed over the drained table is
    BIT-IDENTICAL to the batch operator (exact-decimal additivity)."""
    import glob
    import os
    import shutil
    import time

    from doeecommerce_datapipeline_spark.operators.events import (
        anova_from_moments,
        anova_value_by_type,
    )
    from doeecommerce_datapipeline_spark.sinks.manifest_store import (
        ManifestTable,
    )
    from doeecommerce_datapipeline_spark.streaming.stream_ops import (
        foreach_batch_moments_merge,
    )

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(sf + "/events.parquet").collect()
    third = len(rows) // 3
    batches = [rows[:third], rows[third: 2 * third], rows[2 * third:]]
    base = str(tmp_path / "mom_in")
    os.makedirs(base, exist_ok=True)
    schema = ("event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    for i, chunk in enumerate(batches):
        stg = os.path.join(base, f"_stg{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(stg)
        [part] = glob.glob(os.path.join(stg, "*.parquet"))
        shutil.move(part, os.path.join(base, f"batch{i}.parquet"))
        shutil.rmtree(stg)
        os.utime(os.path.join(base, f"batch{i}.parquet"),
                 (time.time() + i, time.time() + i))

    stats_path = str(tmp_path / "moments_tbl")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
        .writeStream.foreachBatch(
            foreach_batch_moments_merge(
                stats_path, lineage_id=str(tmp_path / "ck")
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    online = anova_from_moments(
        ManifestTable(spark, stats_path).read()
    ).collect()[0]
    batch = anova_value_by_type(spark, sf).collect()[0]
    assert online.asDict() == batch.asDict()
