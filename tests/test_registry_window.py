"""The r9 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder; the ledger is
complete since r8 (336/336 driver records), so every r9 slot must spend
itself on the CURRENCY rotation — an r1–r3-vintage record or a contract
change (pca_embeddings late-r8; ivf_topk / pq_topk tightened r9)."""

import json
import os

import __spark_entry__ as entrymod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _records_through(last_round):
    rec = set()
    for r in range(1, last_round + 1):
        path = os.path.join(HERE, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            rec.update(json.load(f))
    return rec


def test_window_names_resolve_and_lead():
    """r10: the r9 driver record landed (CORRECTNESS_r09, 0 red), so
    queries() now serves the pre-staged _R10_QUEUE as the driver
    correctness window; _R9_WINDOW stays as the r9 ledger map."""
    q = entrymod.queries()
    names = list(q)
    win = entrymod._R10_QUEUE
    assert len(win) == len(set(win)), "duplicate names in _R10_QUEUE"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"
    r9 = entrymod._R9_WINDOW
    assert len(r9) == len(set(r9)) == 50, "_R9_WINDOW ledger map malformed"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 336
    # every window name maps to a callable
    for name in entrymod._R9_WINDOW + entrymod._R10_QUEUE:
        assert callable(q[name]), name


def _latest_vintage(name, through=8):
    latest = None
    for r in range(1, through + 1):
        path = os.path.join(HERE, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            if name in json.load(f):
                latest = r
    return latest


def test_ledger_complete_through_r8():
    """Since r8 every registry entry has a driver record — the
    currency-rotation precondition."""
    missing = set(entrymod.queries()) - _records_through(8)
    assert not missing, f"entries with no driver record: {sorted(missing)}"


def test_window_spends_slots_on_stale_or_changed():
    """The currency-rotation contract: every r9 window slot either
    refreshes an r1–r3-vintage record (oldest first) or re-checks a
    contract change (pca_embeddings tightened late-r8 after the r8
    window froze; ivf_topk / pq_topk tightened to oracle-paired
    contract faces in r9)."""
    contract_changes = {"pca_embeddings", "ivf_topk", "pq_topk"}
    for name in entrymod._R9_WINDOW:
        if name in contract_changes:
            continue
        v = _latest_vintage(name)
        assert v is not None and v <= 3, (
            f"{name} spends a slot on an already-current record "
            f"(latest vintage r{v})"
        )


def test_window_heads_with_r1_stragglers():
    """The four entries whose latest record is still r1-vintage (the
    r7/r8 slot-swap displacements) must head the rotation."""
    assert entrymod._R9_WINDOW[:4] == [
        "dedup_first_event",
        "distinct_projection",
        "customers_without_orders",
        "sliding_hourly",
    ]
    for name in entrymod._R9_WINDOW[:4]:
        assert _latest_vintage(name) == 1


def test_oracle_sql_values_have_no_doubled_backslash():
    """Escape-hygiene guard (r6 regression class): a doubled backslash
    in an oracle SQL VALUE means a regex literal like \\s+ arrives at
    DuckDB escaped — string_split_regex silently stops splitting and
    six shingle-family twins go degenerate at sf0.1 while the unit
    suite stays green. Source-level escape style is free (raw vs
    non-raw strings); the VALUE must never carry a double backslash.

    Allowlist mechanism (ADVICE r6): an oracle that genuinely needs to
    match a literal backslash character (DuckDB regex value `\\\\`)
    earns an entry in _DOUBLED_BACKSLASH_OK with a comment saying
    which literal it matches; the guard then checks the rest.
    """
    _DOUBLED_BACKSLASH_OK: set[str] = set()  # none today

    bad = {
        k
        for k, v in entrymod.oracle_sql().items()
        if "\\\\" in v and k not in _DOUBLED_BACKSLASH_OK
    }
    assert not bad, f"doubled backslash in oracle SQL value(s): {sorted(bad)}"
