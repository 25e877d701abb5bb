"""Grouped-map KS drift test: planted shift detected, identity not."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.profiling import value_drift_ks


def _stage(spark, tmp_path, rows):
    base = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(base)
    return str(tmp_path)


def test_ks_flags_planted_shift_only(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(400):
        # 'stable': same uniform grid in both halves
        rows.append((eid, t0 + timedelta(hours=i), 1, "stable", float(i % 50), "{}")); eid += 1
        # 'shifted': second half jumps by +100
        v = float(i % 50) + (100.0 if i >= 200 else 0.0)
        rows.append((eid, t0 + timedelta(hours=i), 1, "shifted", v, "{}")); eid += 1
    sf_dir = _stage(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in value_drift_ks(spark, sf_dir).collect()}
    assert got["shifted"]["drift"] and got["shifted"]["ks_stat"] > 0.9
    assert not got["stable"]["drift"]
    assert got["stable"]["n_ref"] == got["stable"]["n_cur"] == 200
