"""The r5 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder."""

import json
import os

import __spark_entry__ as entrymod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_names_resolve_and_lead():
    q = entrymod.queries()
    names = list(q)
    win = entrymod._R5_WINDOW
    assert len(win) == len(set(win)), "duplicate names in _R5_WINDOW"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 331
    # every window name maps to a callable
    for name in entrymod._R5_WINDOW:
        assert callable(q[name]), name


def test_window_head_is_the_red_row_fix():
    assert entrymod._R5_WINDOW[0] == "pca_embeddings"


def test_window_spends_slots_on_recordless_entries():
    """The round-5 contract: every window slot either closes a gap
    (no driver record yet) or re-checks an entry whose code/oracle
    changed this round — no slot is wasted re-confirming an
    already-green unchanged entry."""
    rec = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(HERE, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            rec.update(json.load(f))
    changed_this_round = {
        "pca_embeddings",         # face reshaped (r4 red row)
        "approx_aggregates",      # tightened to oracle-paired
        "percentile_sketch_error",  # tightened to oracle-paired
        "pairwise_welch_fdr",     # BH denominator fix
        "adf_daily_revenue",      # null-t verdict fix
    }
    for name in entrymod._R5_WINDOW:
        assert name not in rec or name in changed_this_round, (
            f"{name} already has a driver record and did not change"
        )
