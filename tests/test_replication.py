"""CDC replica: dst converges to src through append/upsert/delete,
resumes from its durable pointer, and re-syncs are no-ops."""

import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
from doeecommerce_datapipeline_spark.sinks.replication import (
    last_applied_version,
    replicate_changes,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


@pytest.fixture()
def tables(spark, tmp_path):
    return (
        ManifestTable(spark, str(tmp_path / "src")),
        ManifestTable(spark, str(tmp_path / "dst")),
    )


def _snap(t):
    return sorted((r["id"], r["v"]) for r in t.read().collect())


def test_replica_converges_through_mutations(spark, tables):
    src, dst = tables
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    assert replicate_changes(src, dst, ["id"]) == 1
    assert _snap(dst) == _snap(src)

    # update + delete + insert on the source, then one sync
    src.upsert(_df(spark, [(2, "B2"), (3, "c")]), ["id"])
    src.delete_where(F.col("id") == 1)
    v = replicate_changes(src, dst, ["id"])
    assert v == src.current_version()
    assert _snap(dst) == _snap(src) == [(2, "B2"), (3, "c")]
    assert last_applied_version(dst) == v

    # idempotent: nothing new → no new replica commit
    before = dst.current_version()
    assert replicate_changes(src, dst, ["id"]) == v
    assert dst.current_version() == before

    # replica history is queryable like any table (time travel intact)
    assert dst.read(version=1).count() == 2


def test_replica_update_and_delete_same_sync(spark, tables):
    """A key updated AND another deleted in the same window: the
    update's delete+insert pair must not retire the updated key."""
    src, dst = tables
    src.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    replicate_changes(src, dst, ["id"])
    src.upsert(_df(spark, [(1, "a2")]), ["id"])   # update
    src.delete_where(F.col("id") == 3)            # pure delete
    replicate_changes(src, dst, ["id"])
    assert _snap(dst) == [(1, "a2"), (2, "b")]
