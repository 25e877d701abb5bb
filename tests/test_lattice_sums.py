"""r9 optimization guards: the generic long-lattice sum family
(`scalars.lattice_split_sum` and its wrappers) must be bit-identical to
the decimal-cast sums it replaced — same declared decimal type, same
cell values — on adversarial inputs: negatives, nulls, exact .5
boundaries, magnitude extremes, and group shapes (empty/all-null).
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.functions.scalars import (
    charge_sum,
    dec_sum,
    disc_rev_sum,
    dsum,
    lattice_2dp,
    lattice_split_sum,
    lattice_sum_9dp_rounded,
    money_lattice_avg,
    money_lattice_dsum,
    money_lattice_sum,
)


def _assert_identical(df_old, df_new):
    assert df_old.dtypes == df_new.dtypes, (df_old.dtypes, df_new.dtypes)
    ro = sorted(map(tuple, df_old.collect()))
    rn = sorted(map(tuple, df_new.collect()))
    assert ro == rn, (ro[:3], rn[:3])


@pytest.fixture(scope="module")
def money_df(spark):
    rnd = random.Random(4242)
    rows = []
    for i in range(5000):
        rows.append(
            (
                i % 7,
                round(rnd.uniform(-1000.0, 200000.0), 2),
                round(rnd.uniform(0.0, 0.10), 2),
                round(rnd.uniform(0.0, 0.08), 2),
            )
        )
    # boundary adversaries: one-cent values of either sign, repr-edge
    # magnitudes, zero. (Sub-cent inputs like 0.005 are OUTSIDE the
    # 2-dp contract: BigDecimal HALF_UP rounds half away-from-zero,
    # the floor lattice toward +inf — they only disagree on inputs
    # that are not 2-dp money in the first place.)
    for v in (0.01, -0.01, -999.85, 104999.91, 499993.18, 0.0, 92233.72):
        rows.append((6, v, 0.05, 0.04))
    rows.append((5, None, None, None))  # null money row
    df = spark.createDataFrame(
        rows, "k int, x double, d double, t double"
    )
    # an all-null group exercises the sum-of-nothing path
    return df.union(
        spark.createDataFrame(
            [(99, None, None, None)], "k int, x double, d double, t double"
        )
    )


def test_money_lattice_sum_equals_dec_sum(spark, money_df):
    for scale in ("decimal(18,2)", "decimal(28,6)", "decimal(18,4)"):
        old = money_df.groupBy("k").agg(
            dec_sum("x", scale).alias("s"),
            dsum("x", scale).alias("sd"),
            (dec_sum(F.col("x"), scale).cast("double") / F.count("x")).alias(
                "av"
            ),
        )
        new = money_df.groupBy("k").agg(
            money_lattice_sum("x", scale).alias("s"),
            money_lattice_dsum("x", scale).alias("sd"),
            money_lattice_avg("x", scale).alias("av"),
        )
        _assert_identical(old, new)


def test_disc_rev_and_charge_sum_equal_decimal_sums(spark, money_df):
    df = money_df.where(F.col("x") > 0)
    disc_price = F.col("x") * (1 - F.col("d"))
    charge = disc_price * (1 + F.col("t"))
    old = df.groupBy("k").agg(
        dec_sum(disc_price, "decimal(28,6)").alias("r"),
        dec_sum(charge, "decimal(28,6)").alias("c"),
    )
    new = df.groupBy("k").agg(
        disc_rev_sum("x", "d").alias("r"),
        charge_sum("x", "d", "t").alias("c"),
    )
    _assert_identical(old, new)


def test_lattice_split_sum_negative_profit_shape(spark, money_df):
    """The profit/acctbal shape: per-row lattice points of either sign
    through the pmod split recombine to the exact decimal sum."""
    df = money_df.where(F.col("x").isNotNull())
    profit = (
        F.col("x") * (1 - F.col("d")) - F.col("x") * F.col("t")
    ).cast("decimal(28,6)")
    m = lattice_2dp("x") * (
        F.lit(100).cast("long") - lattice_2dp("d")
    ) - lattice_2dp("x") * lattice_2dp("t")
    old = df.groupBy("k").agg(F.sum(profit).alias("p"))
    new = df.groupBy("k").agg(
        lattice_split_sum(m, 4, "decimal(38,6)").cast("decimal(38,6)").alias("p")
    )
    # types differ by design here (38,6 both after the old sum hits the
    # precision cap) — compare values only
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_lattice_sum_9dp_rounded_equals_decimal_quantize(spark):
    rnd = random.Random(99)
    vals = [rnd.uniform(-30.0, 30.0) for _ in range(20000)]
    vals += [0.0000000005, -0.0000000005, 2.25e6 - 1.0, -(2.25e6 - 1.0)]
    df = spark.createDataFrame(
        [(i % 11, float(v)) for i, v in enumerate(vals)], "k int, x double"
    )
    old = df.groupBy("k").agg(
        F.sum(F.round("x", 9).cast("decimal(18,9)")).alias("s")
    )
    new = df.groupBy("k").agg(lattice_sum_9dp_rounded(F.col("x")).alias("s"))
    _assert_identical(old, new)


def test_money_lattice_sum_empty_and_allnull(spark):
    df = spark.createDataFrame([(1, None)], "k int, x double")
    row = df.groupBy("k").agg(money_lattice_sum("x").alias("s")).collect()
    assert row[0]["s"] is None
    old = df.groupBy("k").agg(dec_sum("x").alias("s")).collect()
    assert old[0]["s"] is None


def test_money_lattice_sum_large_magnitude_exact(spark):
    """Sums whose scaled integer crosses 2^53 must stay exact decimals
    (the pricing_summary sf1 lesson): pin a constructed total past
    2^53 cents against the Decimal ground truth."""
    n, v = 200_000, 92233.72
    df = spark.createDataFrame([(float(v),)] * n, "x double")
    got = df.agg(money_lattice_sum("x").alias("s")).collect()[0]["s"]
    assert got == Decimal(str(v)) * n
