"""Round-6 hardening units: driver-side collect bound guards, the
degenerate-input guards from ADVICE r5, session-cache eviction, and
the zero-norm embedding seam in the ANN scoreboard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators import events as events_mod
from doeecommerce_datapipeline_spark.operators import session_cache
from doeecommerce_datapipeline_spark.operators.textops import (
    BPE_MAX_MERGES,
    bpe_merge_table,
)

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "sf_events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(d + "/events.parquet")
    return d


def test_markov_edge_bound_breach_raises(spark, monkeypatch):
    """A contract breach (edge table over the vocabulary bound) must
    raise, never OOM the driver with an unbounded collect."""
    monkeypatch.setattr(events_mod, "MARKOV_EDGE_BOUND", 2)
    with pytest.raises(ValueError, match="vocabulary-bounded"):
        events_mod.markov_removal_attribution(spark, SF)


def test_markov_no_conversion_returns_empty(spark, tmp_path):
    """No journey ever converts → no edges into CONV → the absorbing
    probability from START is undefined; the query returns the empty
    frame instead of dividing by zero (ADVICE r5)."""
    d = _write_events(
        spark,
        tmp_path,
        [
            (i, f"2024-01-01 00:0{i}:00", 1, t, 1.0, "{}")
            for i, t in enumerate(["view", "click", "view"])
        ],
    )
    out = events_mod.markov_removal_attribution(spark, d)
    assert out.count() == 0
    assert out.columns == [
        "channel",
        "removal_effect",
        "attribution_share",
        "attributed_value",
    ]


def test_bpe_merge_cap_raises(spark):
    docs = spark.createDataFrame(
        [(1, "a b ab")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="BPE_MAX_MERGES"):
        bpe_merge_table(docs, "doc_id", "text", n_merges=BPE_MAX_MERGES + 1)


def test_session_cache_evicts_foreign_sessions():
    c = {}
    session_cache.put(c, ("app1", "sfA"), 1)
    session_cache.put(c, ("app1", "sfB"), 2)
    assert c == {("app1", "sfA"): 1, ("app1", "sfB"): 2}
    # a new session identity evicts every old-session entry
    session_cache.put(c, ("app2", "sfA"), 3)
    assert c == {("app2", "sfA"): 3}


def test_session_cache_bounds_live_entries():
    c = {}
    for i in range(10):
        session_cache.put(c, ("app1", f"sf{i}"), i)
    assert len(c) <= session_cache.MAX_LIVE_ENTRIES
    # the most recent insert always survives
    assert c[("app1", "sf9")] == 9


def test_ann_recall_eval_zero_norm_vectors(spark, tmp_path):
    """Zero-norm embeddings must be excluded from truth/candidate
    top-k identically by the batched path (Arrow kernel → NaN, which
    Spark ranks as the GREATEST double) and the loop path (JVM HOF →
    NULL, which sorts last): ADVICE r5. Batched ≡ loop must hold on a
    dataset that actually contains zero vectors, and the planted zero
    vectors must never appear in any truth set."""
    from doeecommerce_datapipeline_spark.operators.similarity import (
        ANN_EVAL_QUERIES,
        _ann_recall_eval_loop,
        ann_recall_eval_full,
    )

    rng = np.random.default_rng(7)
    dim, n = 64, 120
    zero_ids = {5, 50}
    rows = []
    for vid in range(n):
        if vid in zero_ids:
            v = [0.0] * dim
        else:
            v = [float(x) for x in rng.normal(size=dim)]
        rows.append((vid, v, vid % 3))
    d = str(tmp_path / "sf_emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(d + "/embeddings.parquet")

    batched = [tuple(r) for r in ann_recall_eval_full(spark, d).collect()]
    loop = [tuple(r) for r in _ann_recall_eval_loop(spark, d).collect()]
    assert batched == loop
    assert len(batched) == 2 * len(ANN_EVAL_QUERIES)

    # the truth sets the scoreboard ranked against exclude zero-norm
    # rows: recompute one truth top-k directly and check
    from doeecommerce_datapipeline_spark.functions.vectors import cosine

    e = spark.read.parquet(d + "/embeddings.parquet")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    truth = {
        r.vec_id
        for r in e.join(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", cosine("embedding", "qv").alias("cos"))
        .where(F.col("cos").isNotNull() & ~F.isnan(F.col("cos")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    assert not (truth & zero_ids)
