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


class IncrementalView:
    """Incremental SUM/COUNT view of a source ManifestTable, grouped
    by ``keys`` with sums over ``sum_cols``."""

    def __init__(
        self,
        spark: SparkSession,
        source: ManifestTable,
        path: str,
        keys: list[str],
        sum_cols: list[str],
    ):
        self.spark = spark
        self.source = source
        self.view = ManifestTable(spark, path)
        self.keys = keys
        self.sum_cols = sum_cols

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

        d = self._delta_agg(self.source.changes(last, cur))
        old = self.view.read()
        merged = d.join(old, self.keys, "left").select(
            *self.keys,
            (F.coalesce(old["n_rows"], F.lit(0)) + F.col("d_n")).alias(
                "n_rows"
            ),
            *[
                (
                    F.coalesce(old[f"sum_{c}"], F.lit(0)) + F.col(f"d_{c}")
                ).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )
        alive = merged.where(F.col("n_rows") > 0)
        dead = merged.where(F.col("n_rows") <= 0).select(*self.keys)
        self.view.upsert(
            alive,
            self.keys,
            retire_keys=dead,
            extra_meta={_META_KEY: cur},
        )
        return cur

    def read(self) -> DataFrame:
        return self.view.read()
