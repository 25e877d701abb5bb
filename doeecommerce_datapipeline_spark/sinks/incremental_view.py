"""Incremental materialized-view maintenance over a ManifestTable.

The reference's gold layer recomputes its aggregates from the full
silver table every run (publish_gold.py full-table GROUP BYs). At
100 TB a nightly full rescan is the single biggest avoidable cost:
an additive aggregate (SUM / COUNT, and AVG derived from them) can be
maintained from the CHANGE FEED alone — work proportional to the
delta, not the table.

Mechanics (classic incremental view maintenance, signed deltas):

1. ``ManifestTable.changes(last_applied, current)`` yields the
   row-level delta; an update surfaces as delete+insert, so tagging
   inserts +1 and deletes −1 makes every measure a signed sum.
2. The delta aggregates per group key — a shuffle over the DELTA only.
3. Changed groups merge into the view through ONE stats-pruned
   ``upsert`` whose ``retire_keys`` clause drops groups whose
   maintained row count reached zero — update+delete are a single
   atomic snapshot transition. Files holding only untouched groups are
   never rewritten, so refresh cost tracks the number of CHANGED
   groups, not view size.

Crash safety: the applied source version rides in the view commit's
own metadata (``extra_meta``), so the pointer and the data are one
atomic write — a crash can only lose the whole refresh (reapplied
cleanly next time), never half of it. Single maintainer assumed, the
same contract as any materialized-view refresher.

Maintained measures: per-group ``n_rows`` plus SUM of each named
column. Sums are maintained in the column's own numeric type — use
exact types (longs or decimals) if the view must be replay-exact;
double sums can drift by float re-association, same as any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .manifest_store import ManifestTable

_META_KEY = "view_source_version"


def _any(conds):
    """OR-fold a non-empty condition list."""
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out



class IncrementalView:
    """Incremental SUM/COUNT/MIN/MAX view of a source ManifestTable,
    grouped by ``keys`` with sums over ``sum_cols`` and extrema over
    ``min_cols``/``max_cols``.

    MIN/MAX are NOT retraction-friendly: inserts merge algebraically
    (least/greatest with the running extremum), but a delete at or
    below the running min (at or above the max) may have removed the
    extremum itself, so exactly those groups RESCAN from the current
    snapshot (semi-join-pruned read); every other group never rescans.
    ``last_rescanned_groups`` (also in the commit meta) reports how
    many — the number a capacity planner watches, since adversarial
    delete patterns degrade toward full recompute while insert-mostly
    workloads stay delta-priced. Changing the measure set after the
    view exists requires a full rebuild (drop the view dir)."""

    def __init__(
        self,
        spark: SparkSession,
        source: ManifestTable,
        path: str,
        keys: list[str],
        sum_cols: list[str],
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.source = source
        self.view = ManifestTable(spark, path)
        self.keys = keys
        self.sum_cols = sum_cols
        self.min_cols = min_cols or []
        self.max_cols = max_cols or []
        self.last_rescanned_groups = 0  # diagnostics for the last refresh

    def last_applied(self) -> int:
        """Source version the view currently reflects (0 = never
        refreshed) — read from the view's own commit meta, so it can
        never disagree with the view's data."""
        v = self.view.current_version()
        return self.view._read_manifest(v).get(_META_KEY, 0) if v else 0

    # ---- aggregation shapes --------------------------------------------
    def _full_agg(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in self.min_cols],
            *[F.max(c).alias(f"max_{c}") for c in self.max_cols],
        )

    def _delta_agg(self, delta: DataFrame) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return delta.groupBy(*self.keys).agg(
            F.sum(sign).alias("d_n"),
            *[F.sum(F.col(c) * sign).alias(f"d_{c}") for c in self.sum_cols],
        )

    # ---- refresh -------------------------------------------------------
    def refresh(self) -> int:
        """Bring the view up to the source's current version; returns
        that version. No view commit when nothing changed."""
        cur = self.source.current_version()
        last = self.last_applied()
        if cur == last:
            return cur
        if last == 0:
            self.view.overwrite(
                self._full_agg(self.source.read(cur)),
                extra_meta={_META_KEY: cur},
            )
            return cur

        changes = self.source.changes(last, cur)
        if self.min_cols or self.max_cols:
            changes = changes.localCheckpoint()  # feeds 3 aggregates
        d = self._delta_agg(changes)
        if self.min_cols or self.max_cols:
            # per-group insert/delete extrema: MIN/MAX are NOT
            # retraction-friendly — a delete at-or-below the running
            # min (at-or-above the max) may have BEEN the extremum, so
            # those groups rescan from the current snapshot; everything
            # else merges algebraically (classic deletable-aggregate
            # maintenance)
            ins = changes.where(F.col("_change_type") == "insert")
            dele = changes.where(F.col("_change_type") == "delete")
            ext = (
                ins.groupBy(*self.keys)
                .agg(
                    *[F.min(c).alias(f"ins_min_{c}") for c in self.min_cols],
                    *[F.max(c).alias(f"ins_max_{c}") for c in self.max_cols],
                )
                .join(
                    dele.groupBy(*self.keys).agg(
                        *[
                            F.min(c).alias(f"del_min_{c}")
                            for c in self.min_cols
                        ],
                        *[
                            F.max(c).alias(f"del_max_{c}")
                            for c in self.max_cols
                        ],
                    ),
                    self.keys,
                    "full_outer",
                )
            )
            d = d.join(ext, self.keys, "full_outer")
        old = self.view.read()
        merged = d.join(old, self.keys, "left").select(
            *self.keys,
            (
                F.coalesce(old["n_rows"], F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).alias("n_rows"),
            *[
                (
                    F.coalesce(old[f"sum_{c}"], F.lit(0))
                    + F.coalesce(F.col(f"d_{c}"), F.lit(0))
                ).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
            *[
                F.least(old[f"min_{c}"], F.col(f"ins_min_{c}")).alias(
                    f"min_{c}"
                )
                for c in self.min_cols
            ],
            *[
                F.greatest(old[f"max_{c}"], F.col(f"ins_max_{c}")).alias(
                    f"max_{c}"
                )
                for c in self.max_cols
            ],
            # a group rescans when any delete could have removed the
            # extremum (or the old extremum is unknown — pre-upgrade
            # view rows)
            (
                F.lit(False)
                if not (self.min_cols or self.max_cols)
                else _any(
                    [
                        F.col(f"del_min_{c}").isNotNull()
                        & (
                            old[f"min_{c}"].isNull()
                            | (F.col(f"del_min_{c}") <= old[f"min_{c}"])
                        )
                        for c in self.min_cols
                    ]
                    + [
                        F.col(f"del_max_{c}").isNotNull()
                        & (
                            old[f"max_{c}"].isNull()
                            | (F.col(f"del_max_{c}") >= old[f"max_{c}"])
                        )
                        for c in self.max_cols
                    ]
                )
            ).alias("_rescan"),
        )
        if self.min_cols or self.max_cols:
            merged = merged.localCheckpoint()
            rescan_keys = merged.where(
                F.col("_rescan") & (F.col("n_rows") > 0)
            ).select(*self.keys)
            self.last_rescanned_groups = rescan_keys.count()
            if self.last_rescanned_groups:
                rescanned = self._full_agg(
                    self.source.read(cur).join(
                        F.broadcast(rescan_keys), self.keys, "left_semi"
                    )
                )
                # rescanned rows carry the TRUE post-delta aggregate
                # straight from the snapshot — they replace the
                # algebraic rows for those groups wholesale
                merged = (
                    merged.join(rescan_keys, self.keys, "left_anti")
                    .drop("_rescan")
                    .unionByName(rescanned)
                )
            else:
                merged = merged.drop("_rescan")
        else:
            self.last_rescanned_groups = 0
            merged = merged.drop("_rescan")
        alive = merged.where(F.col("n_rows") > 0)
        dead = merged.where(F.col("n_rows") <= 0).select(*self.keys)
        self.view.upsert(
            alive,
            self.keys,
            retire_keys=dead,
            extra_meta={
                _META_KEY: cur,
                "rescanned_groups": self.last_rescanned_groups,
            },
        )
        return cur

    def read(self) -> DataFrame:
        return self.view.read()
