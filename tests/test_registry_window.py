"""The r6 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder."""

import json
import os

import __spark_entry__ as entrymod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_names_resolve_and_lead():
    q = entrymod.queries()
    names = list(q)
    win = entrymod._R6_WINDOW
    assert len(win) == len(set(win)), "duplicate names in _R6_WINDOW"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 332
    # every window name maps to a callable
    for name in entrymod._R6_WINDOW:
        assert callable(q[name]), name


def test_window_head_is_the_contract_tightening():
    """r6 head: the entries whose contract tightened to oracle-paired
    (sketch rollup in r5 post-window, deciles + isotonic this round)
    and the new bloom entry, then the record-less queue."""
    assert entrymod._R6_WINDOW[:4] == [
        "sketch_rollup_daily_users",
        "fact_deciles_scalable",
        "isotonic_calibration",
        "bloom_filter_revenue",
    ]
    assert entrymod._R6_WINDOW[4] == "ship_sla_pchart"


def test_window_spends_slots_on_recordless_entries():
    """The rotation contract: every window slot either closes a gap
    (no driver record yet) or re-checks an entry whose code/oracle
    changed this round — no slot is wasted re-confirming an
    already-green unchanged entry."""
    rec = set()
    for r in (1, 2, 3, 4, 5):
        path = os.path.join(HERE, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            rec.update(json.load(f))
    changed_this_round = {
        # tightened to oracle-paired after the r5 window closed
        "sketch_rollup_daily_users",
        # rows-only -> oracle-paired this round (r5 verdict item 7)
        "fact_deciles_scalable",
        "isotonic_calibration",
        # new operator this round (r5 verdict item 4)
        "bloom_filter_revenue",
        # ADVICE r5 fixes (p_full==0 guard + bounded edge collect)
        "markov_removal_attribution",
    }
    for name in entrymod._R6_WINDOW:
        assert name not in rec or name in changed_this_round, (
            f"{name} already has a driver record and did not change"
        )


def test_oracle_sql_values_have_no_doubled_backslash():
    """Escape-hygiene guard (r6 regression class): a doubled backslash
    in an oracle SQL VALUE means a regex literal like \\s+ arrives at
    DuckDB escaped — string_split_regex silently stops splitting and
    six shingle-family twins go degenerate at sf0.1 while the unit
    suite stays green. Source-level escape style is free (raw vs
    non-raw strings); the VALUE must never carry a double backslash."""
    import __spark_entry__ as entrymod

    bad = {k for k, v in entrymod.oracle_sql().items() if "\\\\" in v}
    assert not bad, f"doubled backslash in oracle SQL value(s): {sorted(bad)}"
