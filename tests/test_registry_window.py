"""The r8 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder; with the r8 window
every registry entry holds a driver record (336/336), and the pre-staged
r9 queue must spend every slot on the oldest record vintages."""

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
    q = entrymod.queries()
    names = list(q)
    win = entrymod._R8_WINDOW
    assert len(win) == len(set(win)), "duplicate names in _R8_WINDOW"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 336
    # every window name maps to a callable
    for name in entrymod._R8_WINDOW:
        assert callable(q[name]), name


def test_window_spends_slots_on_gaps_or_changes():
    """The rotation contract: every r8 window slot either closes a
    never-driver-checked gap, refreshes an r1-vintage record, re-checks
    a contract change (quality_classifier_scores, bpe_merges from r7;
    lsh_recall_eval, ann_recall_eval tightened in r8), re-checks a
    reimplementation (numeric_corr_matrix, r4 lattice rewrite), or
    lands a new codec-audit face."""
    contract_changes = {
        "quality_classifier_scores",
        "bpe_merges",
        "lsh_recall_eval",
        "ann_recall_eval",
        "numeric_corr_matrix",
    }
    recordless_or_new = set(entrymod.queries()) - _records_through(7)
    r1_only = _records_through(1) - _records_through_later(2, 7)
    for name in entrymod._R8_WINDOW:
        assert (
            name in contract_changes
            or name in recordless_or_new
            or name in r1_only
        ), f"{name} spends a slot on an already-current record"


def _records_through_later(first_round, last_round):
    rec = set()
    for r in range(first_round, last_round + 1):
        path = os.path.join(HERE, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            rec.update(json.load(f))
    return rec


def test_r8_window_finishes_the_ledger():
    """With the r8 window, every registry entry has a driver record:
    records r1–r7 + the r8 window = the full registry."""
    win = entrymod._R8_WINDOW
    names = set(entrymod.queries())
    missing = names - _records_through(7) - set(win)
    assert not missing, f"entries with no record and no r8 slot: {sorted(missing)}"


def test_r9_queue_well_formed():
    """The pre-staged r9 currency rotation: 50 unique resolvable
    entries, headed by the four r1-vintage stragglers the r7/r8 slot
    swaps displaced."""
    q9 = entrymod._R9_QUEUE
    assert len(q9) == len(set(q9)) == 50
    names = set(entrymod.queries())
    for name in q9:
        assert name in names, f"_R9_QUEUE entry {name} not in registry"
    assert q9[:4] == [
        "dedup_first_event",
        "distinct_projection",
        "customers_without_orders",
        "sliding_hourly",
    ]
    # no overlap with the r8 window — every slot re-checks something
    # the r8 window does not already cover
    assert not set(q9) & set(entrymod._R8_WINDOW)


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
