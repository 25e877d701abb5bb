"""Layout module: partition pruning must be visible in the plan, and
range clustering must produce footer stats that prune point lookups."""

import contextlib
import io

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.io import table
from doeecommerce_datapipeline_spark.layout import (
    file_column_ranges,
    files_containing,
    read_partition_range,
    write_clustered,
    write_date_partitioned,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "lineitem_by_month")
    write_date_partitioned(
        table(spark, sf_dir, "lineitem"), path, "l_shipdate", "month"
    )
    pruned = read_partition_range(spark, path, "1995-03-01", "1995-04-01")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "part_date" in plan
    # the partition column never appears as a data filter on the scan
    # (a scan with only partition filters may omit PushedFilters entirely)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            assert "part_date" not in line

    # semantics unchanged: same rows as filtering the source directly
    src = table(spark, sf_dir, "lineitem").where(
        F.date_trunc("month", "l_shipdate")
        .cast("date")
        .between(F.lit("1995-03-01"), F.lit("1995-04-01"))
    )
    assert pruned.count() == src.count() > 0


def test_clustered_layout_prunes_point_lookups(spark, sf_dir, tmp_path):
    clustered = str(tmp_path / "orders_clustered")
    unclustered = str(tmp_path / "orders_unclustered")
    o = table(spark, sf_dir, "orders")
    write_clustered(o, clustered, ["o_custkey"], n_files=8)
    o.repartition(8).write.mode("overwrite").parquet(unclustered)

    c_ranges = file_column_ranges(clustered, "o_custkey")
    u_ranges = file_column_ranges(unclustered, "o_custkey")
    assert len(c_ranges) >= 4 and len(u_ranges) >= 4

    probes = [r["o_custkey"] for r in o.select("o_custkey").distinct().limit(20).collect()]
    c_hits = sum(files_containing(c_ranges, k) for k in probes)
    u_hits = sum(files_containing(u_ranges, k) for k in probes)
    # round-robin files span ~the whole key range -> a probe hits
    # nearly every file; range-clustered files overlap at most at
    # boundaries -> a probe opens ~1 file
    assert u_hits >= 0.8 * len(probes) * len(u_ranges)
    assert c_hits <= 2 * len(probes)

    # content identical either way
    assert (
        spark.read.parquet(clustered).exceptAll(o).isEmpty()
        and o.exceptAll(spark.read.parquet(clustered)).isEmpty()
    )


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path):
    from doeecommerce_datapipeline_spark.layout import write_zordered

    zpath = str(tmp_path / "orders_zorder")
    rpath = str(tmp_path / "orders_range")
    o = table(spark, sf_dir, "orders").withColumn(
        "order_day",
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).cast("long"),
    )
    write_zordered(o, zpath, ["o_custkey", "order_day"], n_files=8)
    write_clustered(o, rpath, ["o_custkey"], n_files=8)

    def total_span(path, col):
        r = file_column_ranges(path, col)
        return sum(hi - lo for lo, hi in r), len(r)

    # single-column range clustering: custkey bands are tight but the
    # second column is scrambled (each file spans ~the full day range)
    r_cust, nr = total_span(rpath, "o_custkey")
    r_day, _ = total_span(rpath, "order_day")
    z_cust, nz = total_span(zpath, "o_custkey")
    z_day, _ = total_span(zpath, "order_day")
    assert nr >= 4 and nz >= 4

    full_day_span = (
        o.agg((F.max("order_day") - F.min("order_day")).alias("s")).collect()[0]["s"]
    )
    # z-order: BOTH dimensions' summed per-file spans beat the
    # scrambled baseline (n_files × full span); range clustering only
    # narrows the column it sorts on
    assert z_day < 0.8 * nr * full_day_span
    assert r_day > 0.9 * nr * full_day_span
    assert z_cust < 0.8 * r_day  # custkey also retains locality

    # content identical
    z = spark.read.parquet(zpath)
    assert z.exceptAll(o).isEmpty() and o.exceptAll(z).isEmpty()
