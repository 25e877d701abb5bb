"""Versioned-manifest table format: atomic commits + time travel on
plain parquet — the transactional upgrade over the staged-swap sinks
(SURVEY.md §7.4 risk 1: the reference's upsert is Postgres-
transactional; plain-directory overwrites are not).

Design (a minimal Delta-style log, built from public concepts):

    table/
      _manifests/v00000001.json   # ordered list of live data files
      _manifests/v00000002.json
      part-<uuid>.parquet         # immutable data files, append-only

- Writers add new parquet files, then commit a new manifest listing the
  table's full live-file set. The manifest create is O_EXCL-atomic: two
  racing writers can't both claim version N (one loses and retries).
- Readers list `_manifests/`, pick the highest version (or any older
  one — time travel), and read exactly those files. A crashed writer
  leaves orphan data files but never a torn table.
- Delete/upsert = rewrite affected files + commit a manifest that drops
  the old ones. VACUUM = remove data files referenced by no manifest.

At 100 TB the manifest lists (file, partition-values, row-count,
min/max) so planning can prune without touching the filesystem — the
same trajectory Delta/Iceberg take; this implementation keeps just the
file list + counts.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.mdir = os.path.join(path, "_manifests")

    # ---- log internals -------------------------------------------------
    def _versions(self) -> list[int]:
        return sorted(
            int(os.path.basename(p)[1:9])
            for p in glob.glob(os.path.join(self.mdir, "v*.json"))
        )

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def _read_manifest(self, version: int) -> dict:
        with open(os.path.join(self.mdir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def _try_commit(self, version: int, files: list[str], meta: dict) -> bool:
        """O_EXCL manifest create — the atomic commit point."""
        os.makedirs(self.mdir, exist_ok=True)
        target = os.path.join(self.mdir, f"v{version:08d}.json")
        payload = json.dumps({"version": version, "files": files, **meta})
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return True

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write df as new immutable files under the table root; return
        their names. Uses a scratch dir then moves files in (the move is
        per-file but files are invisible until a manifest names them)."""
        scratch = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(scratch)
        os.makedirs(self.path, exist_ok=True)
        names = []
        for p in glob.glob(os.path.join(scratch, "*.parquet")):
            name = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(p, os.path.join(self.path, name))
            names.append(name)
        shutil.rmtree(scratch)  # _SUCCESS markers, crc files, etc.
        return names

    def _commit_retry(self, build) -> int:
        """Optimistic-concurrency commit loop. ``build(base)`` must
        compute the new live-file set AGAINST snapshot ``base`` and
        return (files, schema_json) — so when the O_EXCL create loses a
        race, the next iteration recomputes the rewrite from the
        advanced snapshot instead of committing a stale file list (the
        lost-update hazard: a concurrent append landing between read
        and commit would otherwise be silently dropped). Losing
        iterations may leave orphan data files; vacuum() collects them
        after the retention window."""
        while True:
            base = self.current_version()
            files, schema_json = build(base)
            if self._try_commit(
                base + 1, files, {"base": base, "schema": schema_json}
            ):
                return base + 1

    # ---- public API ----------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v == 0:
            raise FileNotFoundError(f"no committed version in {self.path}")
        man = self._read_manifest(v)
        if not man["files"]:
            schema_json = man.get("schema")
            if not schema_json:
                raise ValueError(
                    f"manifest v{v} is empty and predates schema tracking"
                )
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in man["files"]]
        )

    def append(self, df: DataFrame) -> int:
        """Appends commute: the new files are written once, and on a
        lost race the retry just re-reads the advanced base's file list."""
        new = self._write_data(df)
        schema_json = df.schema.json()
        return self._commit_retry(
            lambda base: (
                (self._read_manifest(base)["files"] if base else []) + new,
                schema_json,
            )
        )

    def overwrite(self, df: DataFrame) -> int:
        """Full replacement — last writer wins BY DESIGN: whatever
        snapshot is current at commit time is superseded wholesale, so
        there is nothing to recompute on a lost race."""
        new = self._write_data(df)
        schema_json = df.schema.json()
        return self._commit_retry(lambda base: (list(new), schema_json))

    def upsert(self, updates: DataFrame, keys: list[str]) -> int:
        """MERGE-style keyed upsert: rewrite survivors + new batch as
        fresh files, commit a manifest dropping every old one. The
        rewrite runs INSIDE the commit loop against the base snapshot,
        so a concurrent append that wins the race is merged on retry,
        never dropped. Readers at any point see either the old snapshot
        or the new one."""

        def build(base: int) -> tuple[list[str], str]:
            if base == 0:
                return self._write_data(updates), updates.schema.json()
            old = self.read(base)
            kept = old.join(updates.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(updates)
            return self._write_data(merged), merged.schema.json()

        return self._commit_retry(build)

    def delete_where(self, condition) -> int:
        """Predicate delete, recomputed against the base snapshot on a
        lost race (same reasoning as upsert)."""

        def build(base: int) -> tuple[list[str], str]:
            if base == 0:
                raise FileNotFoundError(f"no committed version in {self.path}")
            survivors = self.read(base).where(~condition)
            return self._write_data(survivors), survivors.schema.json()

        return self._commit_retry(build)

    def compact(self, target_files: int = 1) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the current
        snapshot into ``target_files`` larger files and commit it as a
        new version — no logical data change. Streaming upserts and
        frequent appends accrete one-file-per-batch tables; bin-packing
        them back together is the standard table-format maintenance op
        (Delta OPTIMIZE / Iceberg rewrite_data_files). Runs inside the
        commit loop, so a concurrent writer that wins the race just
        triggers recompaction of the advanced snapshot — never a lost
        update. Old versions still reference the old files, so time
        travel survives until vacuum() reaps them."""

        def build(base: int) -> tuple[list[str], str]:
            if base == 0:
                raise FileNotFoundError(f"no committed version in {self.path}")
            df = self.read(base).coalesce(target_files)
            return self._write_data(df), df.schema.json()

        return self._commit_retry(build)

    def changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Row-level change feed between two snapshots: rows in
        ``v_to`` but not ``v_from`` tagged ``insert``, rows gone from
        ``v_from`` tagged ``delete`` (an update surfaces as
        delete+insert, multiset semantics via exceptAll). This is what
        lets downstream consumers process a table INCREMENTALLY —
        recompute only what changed since the version they last saw —
        instead of full-table rescans; versions already give exact
        boundaries, so the diff needs no extra bookkeeping at write
        time. Two shuffles over the two snapshots' width; at 100 TB
        prefer diffing a key projection, then joining back."""
        new = self.read(v_to if v_to is not None else self.current_version())
        old = self.read(v_from)
        from pyspark.sql import functions as F

        return new.exceptAll(old).withColumn(
            "_change_type", F.lit("insert")
        ).unionByName(
            old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        )

    def vacuum(self, min_age_sec: float = 3600.0) -> list[str]:
        """Remove data files referenced by no manifest (crashed writers,
        losing commit attempts). Files younger than ``min_age_sec`` are
        kept: an in-flight writer moves data files in BEFORE its
        manifest commit names them, so reaping by reference-count alone
        would tear that writer's table. The default window (1 h) must
        exceed the longest plausible write-to-commit gap."""
        import time

        live: set[str] = set()
        for v in self._versions():
            live |= set(self._read_manifest(v)["files"])
        cutoff = time.time() - min_age_sec
        removed = []
        for p in glob.glob(os.path.join(self.path, "part-*.parquet")):
            if os.path.basename(p) not in live and os.path.getmtime(p) <= cutoff:
                os.remove(p)
                removed.append(os.path.basename(p))
        return removed

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self._versions()]
