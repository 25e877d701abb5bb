"""The r7 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder; the pre-staged r8
queue must finish the 334/334 driver ledger."""

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
    win = entrymod._R7_WINDOW
    assert len(win) == len(set(win)), "duplicate names in _R7_WINDOW"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 334
    # every window name maps to a callable
    for name in entrymod._R7_WINDOW:
        assert callable(q[name]), name


def test_window_spends_slots_on_recordless_entries():
    """The rotation contract: every r7 window slot closes a gap — r6
    finished 50/50 green with zero reds, so the window is exactly the
    next 50 never-driver-checked entries; no slot re-confirms an
    already-green unchanged entry."""
    rec = _records_through(6)
    for name in entrymod._R7_WINDOW:
        assert name not in rec, (
            f"{name} already has a driver record and did not change"
        )


def test_r8_queue_finishes_the_ledger():
    """After the r7 window lands, _R8_QUEUE must cover every entry
    that will still lack a driver record, so r7+r8 = 334/334."""
    q8 = entrymod._R8_QUEUE
    assert len(q8) == len(set(q8)) == 50
    names = set(entrymod.queries())
    for name in q8:
        assert name in names, f"_R8_QUEUE entry {name} not in registry"
    rec = _records_through(6) | set(entrymod._R7_WINDOW)
    missing = names - rec - set(q8)
    assert not missing, f"entries with no record and no r8 slot: {sorted(missing)}"


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
