"""CDC-driven table replication: keep a replica ManifestTable in sync
with a source table by applying its change feed — the raw-row
companion of incremental_view (which maintains an AGGREGATE off the
same feed).

Each sync reads the source versions since the replica's last applied
pointer, splits the diff into inserts and deleted keys, and applies
both in ONE atomic commit (``upsert`` with ``retire_keys``) that also
carries the new pointer — so a crashed or re-run sync resumes from the
exact source version it last durably applied, never double-applying.

At 100 TB: a sync's cost tracks the CHANGED rows (changes() diffs two
snapshots; prefer key-projection diffs there), and the replica's
upsert rewrites only the files its stats intersect — the whole path is
delta-sized, never table-sized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .manifest_store import ManifestTable

_PTR = "replica_source_version"


def last_applied_version(dst: ManifestTable) -> int:
    """The source version the replica last applied (0 = never)."""
    cur = dst.current_version()
    if cur == 0:
        return 0
    return int(dst._read_manifest(cur).get(_PTR, 0))


def replicate_changes(
    src: ManifestTable, dst: ManifestTable, keys: list[str]
) -> int:
    """Advance ``dst`` to ``src``'s current snapshot by change feed.
    Returns the source version now applied; a no-op (already current)
    returns it without committing."""
    target = src.current_version()
    applied = last_applied_version(dst)
    if target == applied:
        return applied
    if applied == 0:
        # bootstrap: the full current snapshot IS the initial delta
        inserts = src.read(target)
        deletes = inserts.limit(0)
    else:
        feed = src.changes(applied, target)
        inserts = feed.where(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        deletes = feed.where(F.col("_change_type") == "delete").drop(
            "_change_type"
        )
    # an update surfaces as delete+insert of the same key: upsert's
    # key-drop handles the replacement, retire_keys handles pure
    # deletes — but a retired key that ALSO has an insert must not be
    # deleted, so retire only keys with no incoming row
    pure_deletes = deletes.select(*keys).join(
        inserts.select(*keys).distinct(), keys, "left_anti"
    )
    dst.upsert(
        inserts,
        keys,
        retire_keys=pure_deletes,
        extra_meta={_PTR: target},
    )
    return target
