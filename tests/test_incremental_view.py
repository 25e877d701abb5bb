"""IncrementalView: delta-maintained SUM/COUNT aggregates must always
equal a from-scratch recompute of the source."""

import pytest

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.sinks.incremental_view import (
    IncrementalView,
)
from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, amount long")


def _expected(spark, src):
    return {
        (r["k"]): (r["n"], r["s"])
        for r in src.read()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }


def _got(iv):
    return {
        r["k"]: (r["n_rows"], r["sum_amount"]) for r in iv.read().collect()
    }


@pytest.fixture()
def src(spark, tmp_path):
    return ManifestTable(spark, str(tmp_path / "src"))


@pytest.fixture()
def iv(spark, src, tmp_path):
    return IncrementalView(
        spark, src, str(tmp_path / "view"), keys=["k"], sum_cols=["amount"]
    )


def test_initial_refresh_is_full_aggregate(spark, src, iv):
    src.append(_df(spark, [(1, 10), (1, 5), (2, 7)]))
    iv.refresh()
    assert _got(iv) == {1: (2, 15), 2: (1, 7)}
    assert iv.last_applied() == src.current_version()


def test_incremental_refresh_tracks_append_upsert_delete(spark, src, iv):
    src.append(_df(spark, [(1, 10), (1, 5), (2, 7), (3, 1)]))
    iv.refresh()

    src.append(_df(spark, [(2, 3), (4, 100)]))  # new rows, new group
    iv.refresh()
    assert _got(iv) == _expected(spark, src)

    # upsert rewrites group 1's rows wholesale (delete+insert in feed)
    src.upsert(_df(spark, [(1, 42)]), ["k"])
    iv.refresh()
    assert _got(iv) == _expected(spark, src)
    assert _got(iv)[1] == (1, 42)

    # deleting every row of group 3 retires the group from the view
    src.delete_where(F.col("k") == 3)
    iv.refresh()
    got = _got(iv)
    assert 3 not in got
    assert got == _expected(spark, src)


def test_refresh_without_changes_commits_nothing(spark, src, iv):
    src.append(_df(spark, [(1, 10)]))
    iv.refresh()
    v = iv.view.current_version()
    iv.refresh()
    assert iv.view.current_version() == v


def test_refresh_only_touches_changed_group_files(spark, src, iv):
    """The scale contract: a delta touching one group must not rewrite
    view files that hold only other groups."""
    src.append(
        _df(spark, [(k, k) for k in range(0, 100)]).repartitionByRange(
            4, "k"
        )
    )
    iv.refresh()
    iv.view.compact(target_files=4, cluster_by=["k"])  # range-clustered
    before = set(iv.view._read_manifest(iv.view.current_version())["files"])

    src.append(_df(spark, [(99, 1000)]))  # touches only the top range
    iv.refresh()
    after = set(iv.view._read_manifest(iv.view.current_version())["files"])

    assert len(before & after) >= 2  # low-range view files untouched
    assert _got(iv) == _expected(spark, src)


def test_minmax_maintenance_with_retraction_rescan(spark, tmp_path):
    """MIN/MAX views: inserts merge algebraically; deleting the
    extremum triggers a rescan of exactly the affected groups; the
    view always equals a from-scratch recompute."""
    src = ManifestTable(spark, str(tmp_path / "mmsrc"))
    iv = IncrementalView(
        spark,
        src,
        str(tmp_path / "mmview"),
        keys=["k"],
        sum_cols=["amount"],
        min_cols=["amount"],
        max_cols=["amount"],
    )

    def check():
        want = {
            r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in src.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("amount").alias("s"),
                F.min("amount").alias("mn"),
                F.max("amount").alias("mx"),
            )
            .collect()
        }
        got = {
            r["k"]: (r["n_rows"], r["sum_amount"], r["min_amount"],
                     r["max_amount"])
            for r in iv.read().collect()
        }
        assert got == want

    src.append(_df(spark, [(1, 10), (1, 50), (2, 7)]))
    iv.refresh()
    check()
    # insert-only delta: no rescan, extremum updates algebraically
    src.append(_df(spark, [(1, 3), (2, 100)]))
    iv.refresh()
    check()
    assert iv.last_rescanned_groups == 0
    # delete a NON-extremum row of group 1 (amount 10): still no rescan
    src.delete_where((F.col("k") == 1) & (F.col("amount") == 10))
    iv.refresh()
    check()
    assert iv.last_rescanned_groups == 0
    # delete group 1's MIN (amount 3): that group rescans, group 2 not
    src.delete_where((F.col("k") == 1) & (F.col("amount") == 3))
    iv.refresh()
    check()
    assert iv.last_rescanned_groups == 1
    # delete group 2 entirely: group retires, no stale row remains
    src.delete_where(F.col("k") == 2)
    iv.refresh()
    assert {r["k"] for r in iv.read().collect()} == {1}
    check()
