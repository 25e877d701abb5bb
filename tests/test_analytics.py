"""Bounds tests for the approximate (rows-only) aggregates."""

from doeecommerce_datapipeline_spark.operators.analytics import (
    approx_aggregates,
    approx_aggregates_full,
)


def test_approx_within_bounds(spark, sf_dir):
    r = approx_aggregates_full(spark, sf_dir).collect()[0]
    assert abs(r["approx_orders"] - r["exact_orders"]) / r["exact_orders"] < 0.10
    assert (
        abs(r["approx_median_price"] - r["exact_median_price"])
        / r["exact_median_price"]
        < 0.05
    )


def test_approx_aggregates_face_flags_true(spark, sf_dir):
    """The oracle-paired face: exact halves plus contract flags, and
    the flags must verdict TRUE (the sketch honours its bounds)."""
    r = approx_aggregates(spark, sf_dir).collect()[0]
    assert r["distinct_within_10pct"] is True
    assert r["median_within_5pct"] is True
    assert r["exact_orders"] > 0 and r["exact_median_price"] > 0


def test_hash_split_no_duplicate_leakage(spark):
    """Byte-identical (post-normalization) documents must land in the
    same split — the content-hash property that prevents train/test
    leakage through duplicates."""
    from doeecommerce_datapipeline_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "The  Quick   brown fox"), (2, "the quick brown fox"), (3, "other words")],
        ["doc_id", "text"],
    )
    bucket = (
        F.conv(F.substring(fingerprint("text"), 1, 8), 16, 10).cast("long") % 100
    )
    got = {r["doc_id"]: r["b"] for r in df.select("doc_id", bucket.alias("b")).collect()}
    assert got[1] == got[2]


def test_fact_deciles_scalable_mass_balance(spark, sf_dir):
    """Sketch-bounded deciles: 10 buckets, monotone ranges, and every
    bucket within 3% relative mass of the ideal n/10; the r6 oracle-
    paired face must verdict TRUE on both contract flags and carry
    the exact total."""
    from doeecommerce_datapipeline_spark.operators.analytics import (
        fact_deciles_full,
        fact_deciles_scalable,
    )

    rows = fact_deciles_full(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    total = sum(r["n_rows"] for r in rows)
    for r in rows:
        assert abs(r["n_rows"] - total / 10) / (total / 10) < 0.03
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]

    face = fact_deciles_scalable(spark, sf_dir).collect()
    assert [r["decile"] for r in face] == list(range(1, 11))
    for r in face:
        assert r["n_total"] == total
        assert r["mass_within_10pct"] and r["bounds_ordered"]


def test_sketch_rollup_error_bounded(spark, sf_dir):
    """Merged daily HLL sketches must land within 5% of the exact
    monthly distinct count (HLL default lgConfigK=12 → ~1.6% rsd),
    and the oracle-paired face's flag must verdict TRUE."""
    from doeecommerce_datapipeline_spark.operators.analytics import (
        sketch_rollup_daily_users,
        sketch_rollup_daily_users_full,
    )

    rows = sketch_rollup_daily_users_full(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r["approx_users"] - r["exact_users"]) / max(
            r["exact_users"], 1
        )
        assert rel < 0.05, f"{r['month']}: rel err {rel:.3f}"
    face = sketch_rollup_daily_users(spark, sf_dir).collect()
    assert len(face) == len(rows)
    assert all(r["approx_within_10pct"] is True for r in face)


def test_numeric_corr_matrix_bounds_and_selfconsistency(spark, sf_dir):
    from doeecommerce_datapipeline_spark.operators.analytics import (
        numeric_corr_matrix,
    )

    rows = numeric_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.corr is None or -1.0 <= r.corr <= 1.0
    # quantity ⟂ price in TPC-H-ish generators: weak correlation
    qp = {(r.col_x, r.col_y): r.corr for r in rows}[
        ("l_quantity", "l_extendedprice")
    ]
    assert qp is not None


def test_winsorized_stats_clip_counts_and_bounds(spark, sf_dir):
    from doeecommerce_datapipeline_spark.operators.analytics import (
        winsorized_value_stats,
    )

    for r in winsorized_value_stats(spark, sf_dir).collect():
        assert r.lo <= r.hi
        # ~1% clipped each side by construction (small-n rounding slack)
        assert r.n_low <= max(3, int(0.02 * r.n))
        assert r.n_high <= max(3, int(0.02 * r.n))
        assert r.lo <= r.mean_w <= r.hi
        assert r.sd_w >= 0.0


def test_percentile_sketch_error_within_rank_bound(spark):
    """GK with accuracy=100 guarantees rank error <= 1/100: verify
    the approx value's TRUE rank sits within n/100 of the target,
    and that the face's own within_rank_bound verdict agrees."""
    from doeecommerce_datapipeline_spark.operators.analytics import (
        percentile_sketch_report,
    )
    from doeecommerce_datapipeline_spark.io import table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    o = table(spark, sf, "orders")
    n = o.count()
    out = percentile_sketch_report(spark, sf).collect()
    assert [r.q for r in out] == [0.5, 0.9, 0.99]
    for r in out:
        true_rank = o.where(F.col("o_totalprice") <= r.approx).count()
        assert abs(true_rank - r.q * n) <= n / 100 + 1, r
        assert r.within_rank_bound is True, r


def test_dcor_lattice_equals_decimal_quantize(spark):
    """r9 optimization guard: distance_correlation_daily's three
    pair-table sums switched from sum(cast(round(x,6) AS
    DECIMAL(38,6))) to the exact long-lattice sum
    floor(round(x,6)*1e6 + 0.5). Pin the per-row identity the rewrite
    rests on — for 6-dp-rounded doubles of either sign across the
    operator's magnitude envelope, the lattice integer equals the
    decimal's unscaled value."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(1909)
    xs = []
    # raw (un-rounded) products of either sign; Spark's own
    # round(x, 6) below produces the lattice-aligned doubles the
    # operator feeds the sum — the identity's domain is exactly the
    # image of round(·, 6). Magnitudes up to 1e9 keep unscaled m
    # under ~1e15, inside the operator's documented Σ|m| < 2^53
    # envelope (beyond it BOTH the old decimal→double conversion and
    # the lattice recovery lose exactness).
    for mag in (1e-6, 1e-3, 1.0, 1e3, 1e6, 1e9):
        xs += [rnd.uniform(-mag, mag) for _ in range(2000)]
    xs += [0.0, -0.0, 0.0000005, -0.0000005, 123456.1234565,
           -123456.1234565, 1e9 + 0.5e-6, -(1e9 + 0.5e-6)]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    r6 = F.round(F.col("x"), 6)
    rows = df.select(
        F.floor(r6 * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lat"),
        (r6.cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("dec_unscaled"),
    ).collect()
    bad = [r for r in rows if r.lat != r.dec_unscaled]
    assert not bad, bad[:5]


def test_price_power_lattice_equals_decimal_sums(spark):
    """r9 optimization guard: price_power_means switched its three
    per-row DECIMAL casts + decimal agg buffers to exact LONG lattice
    sums with an exact decimal reconstruction of each total. Pin the
    per-row identities on synthetic 2-dp prices across the TPC-H
    magnitude envelope: cents, the 7-dp ln quantum, and the 9-dp
    reciprocal quantum each recover the decimal's unscaled value."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(424)
    prices = [round(rnd.uniform(0.01, 200000.0), 2) for _ in range(20000)]
    prices += [0.01, 0.02, 0.99, 1.0, 900.91, 104949.5, 199999.99]
    df = spark.createDataFrame([(float(p),) for p in prices], "x double")
    r7 = F.round(F.log("x"), 7)
    r9 = F.round(F.lit(1.0) / F.col("x"), 9)
    rows = df.select(
        (
            F.floor(F.col("x") * F.lit(100.0) + F.lit(0.5)).cast("long")
            == (F.col("x").cast("decimal(18,2)") * 100).cast("long")
        ).alias("c_ok"),
        (
            F.floor(r7 * F.lit(1e7) + F.lit(0.5)).cast("long")
            == (r7.cast("decimal(18,7)") * 10000000).cast("long")
        ).alias("ln_ok"),
        (
            F.floor(r9 * F.lit(1e9) + F.lit(0.5)).cast("long")
            == (r9.cast("decimal(18,9)") * 1000000000).cast("long")
        ).alias("inv_ok"),
    ).collect()
    assert all(r.c_ok and r.ln_ok and r.inv_ok for r in rows)
