"""Skew utilities: salting must preserve exact semantics."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)


def _skewed(spark):
    # 90% of rows on one hot key
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (float(r["s"]), r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(28,6)")).alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (float(r["s"]), r["c"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_left_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], "k string, tag string"
    )
    plain = sorted(
        (r["k"], r["v"], r["tag"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["tag"])
        for r in salted_broadcast_left(big, small, "k").collect()
    )
    assert plain == salted


def test_salted_shuffle_join_matches_plain(spark):
    """Two large sides, 90%-hot probe key, multiple matching rows per
    key on the other side (so the join fans out) — the salted big⋈big
    join must reproduce the plain inner join exactly."""
    from doeecommerce_datapipeline_spark.operators.skew import (
        detect_hot_keys,
        salted_shuffle_join,
    )

    skewed = _skewed(spark).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    # other side: 3 rows for the hot key, 1-2 for cold keys
    other = (
        spark.createDataFrame(
            [("hot", i) for i in range(3)]
            + [(f"c{j}", 0) for j in range(50)]
            + [(f"c{j}", 1) for j in range(0, 50, 2)],
            "k string, ver int",
        )
    )
    hot = detect_hot_keys(skewed, "k", threshold_frac=0.5)
    assert hot == ["hot"], f"hot-key probe missed: {hot}"

    plain = sorted(
        (r["k"], r["rid"], r["ver"]) for r in skewed.join(other, "k").collect()
    )
    salted = sorted(
        (r["k"], r["rid"], r["ver"])
        for r in salted_shuffle_join(skewed, other, "k", hot_keys=hot).collect()
    )
    assert plain == salted
    # auto-detect path agrees too
    auto = sorted(
        (r["k"], r["rid"], r["ver"])
        for r in salted_shuffle_join(skewed, other, "k").collect()
    )
    assert plain == auto
