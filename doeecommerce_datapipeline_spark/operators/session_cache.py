"""Session-scoped memo caches for trained/fixed-point operator state.

Several operators share one deterministic computation across registry
faces (the ANN eval index, the lattice k-means assignment, the LPA
fixed point, the quality-classifier fit). Each keeps a module-level
dict keyed by (session-identity, sf_dir). Unbounded dicts leak:
entries for stopped sessions are dead weight, and live-session
localCheckpointed frames pin executor storage for every dataset ever
touched in a long-lived driver. `put` is the single insertion point
enforcing the bound: entries belonging to a DIFFERENT session identity
are evicted (their checkpointed frames died with their session), and
per-session entries are FIFO-capped so a driver that walks many
datasets keeps only the most recent few.
"""

from __future__ import annotations

# max (session, dataset) entries kept per cache for the live session —
# a session touches at most a couple of sf dirs; 4 is generous.
MAX_LIVE_ENTRIES = 4

# Every module-level memo cache registers itself here so a measurement
# harness can empty ALL of them between timed runs (r9 verdict: the
# bench's untimed warm pass populated these, so ~8 timed figures
# measured cache hits instead of computation). Operators never call
# clear_all themselves — intra-query evaluate-once reuse is the point
# of the caches; only the bench's timing loop resets them.
_REGISTERED: list[dict] = []


def register(cache: dict) -> dict:
    """Track `cache` for clear_all(). Returns it for assignment."""
    _REGISTERED.append(cache)
    return cache


def clear_all() -> None:
    """Empty every registered cache (bench timing hygiene: the next
    query construction recomputes trained/fixed-point state from the
    parquet inputs instead of reading a warm-pass memo)."""
    for c in _REGISTERED:
        c.clear()


def put(cache: dict, key: tuple, value):
    """Insert `value` under `key` (= (session_identity, ...)) and
    enforce the cache bound. Returns `value` for call-site chaining."""
    session_identity = key[0]
    for k in [k for k in cache if k[0] != session_identity]:
        cache.pop(k, None)
    while len(cache) >= MAX_LIVE_ENTRIES:
        cache.pop(next(iter(cache)), None)
    cache[key] = value
    return value
