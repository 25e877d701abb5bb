"""The r4 driver window must be well-formed: 50 entries, all resolvable,
no duplicates, no registry entry lost by the reorder."""

import __spark_entry__ as entrymod


def test_window_names_resolve_and_lead():
    q = entrymod.queries()
    names = list(q)
    win = entrymod._R4_WINDOW
    assert len(win) == len(set(win)), "duplicate names in _R4_WINDOW"
    assert len(win) == 50, f"driver checks exactly 50; window has {len(win)}"
    assert names[: len(win)] == win, "window must lead the registry"


def test_reorder_loses_nothing():
    q = entrymod.queries()
    assert len(q) >= 156
    # every window name maps to a callable
    for name in entrymod._R4_WINDOW:
        assert callable(q[name]), name


def test_window_head_is_the_red_row_fix():
    assert entrymod._R4_WINDOW[0] == "value_mad_outliers"
