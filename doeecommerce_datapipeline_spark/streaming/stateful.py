"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics watermarked windows can't express
(SURVEY.md §2.9 mapping).

Implemented operator: per-user running session tracker. For each user
the state carries (current session start, last event time, event
count); an event more than GAP seconds after the previous one closes
the open session and emits it, then starts a new one. Timed-out state
flushes the final open session — so every session is emitted exactly
once, append-mode.

This is the online variant of operators/events.py:sessionize (the
batch lag+cumsum formulation) — same session boundaries, incremental
state instead of a window over history.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pyfiles import ensure_shipped

SESSION_GAP_SEC = 30 * 60

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"


def _make_tracker(use_timeout: bool):
    def _track_sessions(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Fold this micro-batch's events of one user into session
        state, emitting every session that closed."""
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="s")],
                        "session_end": [pd.Timestamp(last, unit="s")],
                        "n_events": [n],
                    }
                )
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v.timestamp()) for v in pdf["ts"])
        ts.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_SEC:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                    "n_events": [n_ for _, _, n_ in closed],
                }
            )

    return _track_sessions


def sessionize_stream(events: DataFrame, flush_open_sessions: bool = False) -> DataFrame:
    """events stream → closed-session stream (append mode).

    flush_open_sessions=True adds a processing-time timeout that emits
    the final open session of an idle user — correct for continuous
    production triggers, but with trigger(availableNow) it spins
    endless timeout-check micro-batches after input is drained, so
    bounded runs keep the default False (open sessions simply stay
    open, exactly like the batch formulation's last session per user).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_open_sessions
        else GroupStateTimeout.NoTimeout
    )
    ensure_shipped(events.sparkSession)  # state fn must import on workers
    return events.groupBy("user_id").applyInPandasWithState(
        _make_tracker(flush_open_sessions),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


VELOCITY_N = 3
VELOCITY_WINDOW_SEC = 60

ALERT_SCHEMA = (
    "user_id long, alert_ts timestamp, n_in_window long, window_sec long"
)


def _track_velocity(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Sliding-count state: keep each user's event times from the last
    VELOCITY_WINDOW_SEC; whenever the count reaches VELOCITY_N, emit
    ONE alert and reset (re-arm) — the rate-limit/fraud-velocity rule.
    State is bounded by the window (≤ N-1 timestamps survive a purge)."""
    (user_id,) = key
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(v.timestamp()) for v in pdf["ts"])
    ts.sort()

    recent: list[int] = list(state.get[0]) if state.exists else []
    alerts: list[int] = []
    for t in ts:
        recent = [x for x in recent if t - x < VELOCITY_WINDOW_SEC]
        recent.append(t)
        if len(recent) >= VELOCITY_N:
            alerts.append(t)
            recent = []  # re-arm: one alert per burst
    state.update((recent,))
    if alerts:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(alerts),
                "alert_ts": [pd.Timestamp(t, unit="s") for t in alerts],
                "n_in_window": [VELOCITY_N] * len(alerts),
                "window_sec": [VELOCITY_WINDOW_SEC] * len(alerts),
            }
        )


def velocity_alert_stream(events: DataFrame) -> DataFrame:
    """events stream → alert stream: one row each time a user fires
    VELOCITY_N events inside VELOCITY_WINDOW_SEC (then re-arms). The
    second applyInPandasWithState operator — unlike the sessionizer's
    gap rule, this one needs a sliding SET of timestamps as state,
    which no watermarked built-in window expresses."""
    ensure_shipped(events.sparkSession)
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_velocity,
            outputStructType=ALERT_SCHEMA,
            stateStructType="recent array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_OUT_SCHEMA = "key string, seq long, x double, ewma double"
EWMA_STATE_SCHEMA = "last_seq long, e double"


def _track_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's (seq, x) points of one key into the
    running EWMA. Points sort by seq inside the batch; a point at or
    before the already-consumed frontier (cross-batch late/duplicate
    delivery) is DROPPED — the recursion is order-defined, so a late
    point cannot be retro-folded without replaying everything after
    it (that replay path is the batch operator)."""
    import numpy as np

    from ..operators.windows import EWMA_ALPHA

    (k,) = key
    pts: list[tuple[int, float]] = []
    for pdf in pdfs:
        pts.extend(zip((int(s) for s in pdf["seq"]), map(float, pdf["x"])))
    pts.sort()

    if state.exists:
        last_seq, e = state.get
        have = True
    else:
        last_seq, e, have = -1, 0.0, False
    out: dict = {"key": [], "seq": [], "x": [], "ewma": []}
    for s, x in pts:
        if have and s <= last_seq:
            continue  # stale redelivery: frontier already passed it
        if not have:
            e = float(np.floor(x * 1e4 + 0.5) / 1e4)
            have = True
        else:
            e = float(
                np.floor(
                    (EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * e) * 1e4 + 0.5
                )
                / 1e4
            )
        last_seq = s
        out["key"].append(k)
        out["seq"].append(s)
        out["x"].append(x)
        out["ewma"].append(e)
    if have:
        state.update((last_seq, e))
    if out["seq"]:
        yield pd.DataFrame(out)


def ewma_stream(points: DataFrame) -> DataFrame:
    """(key, seq, x) stream → (key, seq, x, ewma) stream: the ONLINE
    form of operators/windows.py:ewma_recursive_daily — identical
    floor-lattice step arithmetic, so a drained stream is
    BIT-IDENTICAL to the batch recursion over the same series (the
    e2e in tests/test_stateful_streaming.py pins this). State per key
    is two scalars (frontier seq + current ewma) — constant memory at
    any stream length; the third applyInPandasWithState operator,
    needing ORDERED per-key state no watermarked window expresses."""
    ensure_shipped(points.sparkSession)
    return points.groupBy("key").applyInPandasWithState(
        _track_ewma,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUT_SCHEMA = "user_id long, depth integer"
FUNNEL_STATE_SCHEMA = (
    "last_ts long, last_eid long, last_view long, last_click long,"
    " depth integer"
)
_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


def _track_funnel(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events of one user into the
    view→click→purchase chain state (last view ts, last QUALIFYING
    click ts, depth). Events sort by (ts, event_id) inside the batch;
    anything at or before the consumed frontier is dropped — the
    chain is order-defined, exactly like the EWMA recursion. The
    state transition mirrors operators/events.window_funnel_depth's
    running conditional maxima step for step, so a drained stream's
    depth histogram is identical to the batch answer (e2e-pinned)."""
    (uid,) = key
    evs: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        evs.extend(
            zip(
                (int(t) for t in pdf["tus"]),
                (int(e) for e in pdf["event_id"]),
                pdf["event_type"],
            )
        )
    evs.sort()
    if state.exists:
        last_ts, last_eid, last_view, last_click, depth = state.get
    else:
        last_ts, last_eid, last_view, last_click, depth = (
            -1,
            -1,
            -1,
            -1,
            0,
        )
    for t, eid, et in evs:
        if (t, eid) <= (last_ts, last_eid):
            continue  # stale redelivery behind the frontier
        if et == "view":
            last_view = t
            if depth < 1:
                depth = 1
        elif et == "click":
            if (
                last_view >= 0
                and 0 < t - last_view <= _FUNNEL_WINDOW_US
            ):
                last_click = t
                if depth < 2:
                    depth = 2
        elif et == "purchase":
            if (
                last_click >= 0
                and 0 < t - last_click <= _FUNNEL_WINDOW_US
            ):
                if depth < 3:
                    depth = 3
        last_ts, last_eid = t, eid
    state.update((last_ts, last_eid, last_view, last_click, depth))
    yield pd.DataFrame({"user_id": [uid], "depth": [depth]})


def funnel_depth_stream(events: DataFrame) -> DataFrame:
    """Online windowFunnel: per micro-batch, each user's current chain
    depth — constant state per user (four timestamps + a depth), the
    streaming face of window_funnel_depth."""
    ensure_shipped(events.sparkSession)
    pts = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tus"),
        "event_type",
    )
    return pts.groupBy("user_id").applyInPandasWithState(
        _track_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPACE_SAVING_K = 20
SS_OUT_SCHEMA = (
    "grp string, item string, count_est long, err_bound long,"
    " n_seen long, version long"
)
SS_STATE_SCHEMA = "counters string, n long"


def _make_space_saving(k: int):
    def _fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Fold one group's micro-batch items into its ≤k space-saving
        counters (Metwally et al.): a hit increments, a miss with room
        opens a fresh counter, a miss at capacity overwrites the
        MINIMUM counter (err = its old count). Invariants — every item
        with true count > n/k is present, and for each counter
        true ≤ count_est and count_est − err_bound ≤ true — hold for
        ANY arrival order, so cross-batch ordering needs no frontier
        state (unlike the EWMA recursion). Emits the full snapshot
        stamped with version = items folded so far; readers keep each
        group's max version."""
        import json

        (g,) = key
        items: list[str] = []
        for pdf in pdfs:
            p = pdf.sort_values("seq")
            items.extend(str(v) for v in p["item"])
        if state.exists:
            enc, n = state.get
            counters = {
                it: (int(c), int(e))
                for it, c, e in json.loads(enc)
            }
        else:
            counters, n = {}, 0
        for it in items:
            n += 1
            if it in counters:
                c, e = counters[it]
                counters[it] = (c + 1, e)
            elif len(counters) < k:
                counters[it] = (1, 0)
            else:
                # deterministic eviction: smallest (count, item)
                victim = min(
                    counters, key=lambda x: (counters[x][0], x)
                )
                vc, _ = counters.pop(victim)
                counters[it] = (vc + 1, vc)
        state.update(
            (
                json.dumps(
                    [[it, c, e] for it, (c, e) in sorted(counters.items())]
                ),
                n,
            )
        )
        if items:
            snap = sorted(
                counters.items(), key=lambda x: (-x[1][0], x[0])
            )
            yield pd.DataFrame(
                {
                    "grp": [g] * len(snap),
                    "item": [it for it, _ in snap],
                    "count_est": [c for _, (c, _) in snap],
                    "err_bound": [e for _, (_, e) in snap],
                    "n_seen": [n] * len(snap),
                    "version": [n] * len(snap),
                }
            )

    return _fold


def space_saving_stream(
    rows: DataFrame, k: int = SPACE_SAVING_K
) -> DataFrame:
    """(grp, item, seq) stream → versioned top-k snapshots per group:
    the ONLINE heavy-hitter summary with HARD per-item error bounds —
    the deterministic-guarantee complement of the CMS sketch sink
    (foreach_batch_cms_merge gives fixed-size probabilistic counts;
    space-saving gives ≤k counters whose error is CERTIFIED per item
    by err_bound). State per group is the k-counter table + one total,
    constant at any stream length; the fourth applyInPandasWithState
    operator. Readers take each group's max-version snapshot; the
    guarantee (every item with true count > n/k survives; true count
    ∈ [count_est − err_bound, count_est]) holds under any arrival
    order and any micro-batch partitioning."""
    ensure_shipped(rows.sparkSession)
    return rows.groupBy("grp").applyInPandasWithState(
        _make_space_saving(k),
        outputStructType=SS_OUT_SCHEMA,
        stateStructType=SS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MARKOV_OUT_SCHEMA = "user_id long, counts string, version long"
MARKOV_STATE_SCHEMA = (
    "last_ts long, last_eid long, last_type string, counts string,"
    " version long"
)


def _track_markov(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold one user's micro-batch into the running first-order
    transition counts. Events sort by (ts, event_id) inside the batch;
    anything at or before the consumed frontier drops (stale
    redelivery). The per-event step -- count (last_type -> type), then
    advance -- mirrors operators/events.markov_transitions' lead()
    definition exactly, so the drained per-user counts summed across
    users equal the batch transition matrix (e2e-pinned). Counts
    serialize as sorted-key JSON (the space-saving state pattern)."""
    import json

    (uid,) = key
    evs: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        evs.extend(
            zip(
                (int(t) for t in pdf["tus"]),
                (int(e) for e in pdf["event_id"]),
                pdf["event_type"],
            )
        )
    evs.sort()
    if state.exists:
        last_ts, last_eid, last_type, blob, version = state.get
        counts = json.loads(blob)
    else:
        last_ts, last_eid, last_type, counts, version = -1, -1, None, {}, 0
    for t, eid, et in evs:
        if (t, eid) <= (last_ts, last_eid):
            continue  # behind the frontier
        if last_type is not None:
            k = f"{last_type} {et}"
            counts[k] = counts.get(k, 0) + 1
        last_type = et
        last_ts, last_eid = t, eid
    version += 1
    blob = json.dumps(counts, sort_keys=True)
    state.update((last_ts, last_eid, last_type, blob, version))
    yield pd.DataFrame(
        {"user_id": [uid], "counts": [blob], "version": [version]}
    )


def markov_stream(events: DataFrame) -> DataFrame:
    """Online first-order Markov transition counter: per micro-batch,
    each touched user's full transition-count snapshot -- constant
    state per user (frontier + last type + a bounded count map, at
    most |event types| squared keys). The streaming face of
    markov_transitions / markov_entropy_rate: drain, take each user's
    max-version row, and the summed counts are the batch transition
    matrix."""
    ensure_shipped(events.sparkSession)
    pts = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tus"),
        "event_type",
    )
    return pts.groupBy("user_id").applyInPandasWithState(
        _track_markov,
        outputStructType=MARKOV_OUT_SCHEMA,
        stateStructType=MARKOV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SUPPRESS_COOLDOWN_SEC = 600
SUPPRESS_OUT_SCHEMA = (
    "alert_key string, ts timestamp, n_suppressed long, emitted boolean"
)
SUPPRESS_STATE_SCHEMA = "last_emit_us long, n_suppressed long"


def _track_suppression(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold one alert key's micro-batch: emit the first alert, swallow
    repeats inside the cooldown (counting them), re-arm after it.
    Alerts sort by timestamp inside the batch so the decision sequence
    is order-defined."""
    import pandas as pd

    (akey,) = key
    alerts = []
    for pdf in pdfs:
        alerts.extend(int(t) for t in pdf["tus"])
    alerts.sort()
    if state.exists:
        last_emit, n_sup = state.get
    else:
        last_emit, n_sup = -(10 ** 18), 0
    out_ts, out_sup, out_emit = [], [], []
    for t in alerts:
        if t - last_emit >= SUPPRESS_COOLDOWN_SEC * 1_000_000:
            out_ts.append(t)
            out_sup.append(n_sup)
            out_emit.append(True)
            last_emit, n_sup = t, 0
        else:
            n_sup += 1
    state.update((last_emit, n_sup))
    yield pd.DataFrame(
        {
            "alert_key": [akey] * len(out_ts),
            "ts": pd.to_datetime(out_ts, unit="us"),
            "n_suppressed": out_sup,
            "emitted": [True] * len(out_ts),
        }
    )


def alert_suppression_stream(alerts: DataFrame) -> DataFrame:
    """Alert-fatigue control: pass each key's FIRST alert, swallow
    repeats for a 10-minute cooldown, and stamp every emitted alert
    with how many were suppressed since the last one — the dedup stage
    every alerting pipeline needs between detection (velocity_alert_
    stream, the PSI monitor) and the pager. Constant state per key
    (one timestamp + one counter); emitted stream is append-mode.
    Input: any stream with (alert_key string, ts timestamp)."""
    ensure_shipped(alerts.sparkSession)
    pts = alerts.select(
        "alert_key", F.unix_micros("ts").alias("tus")
    )
    return pts.groupBy("alert_key").applyInPandasWithState(
        _track_suppression,
        outputStructType=SUPPRESS_OUT_SCHEMA,
        stateStructType=SUPPRESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
