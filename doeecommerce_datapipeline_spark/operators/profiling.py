"""Table profiling: per-column null counts + cardinality in one
aggregate pass — the data-profiling primitive (deequ/Glue-crawler
class) that fronts every new-source onboarding.

Shape: ONE aggregate computes every column's metrics side by side
(null counts are plain conditional sums; distinct counts share the
single Expand pass Spark plans for multi-countDistinct), and the
single metrics row unpivots into per-column rows map-side. At 100 TB
set ``exact=False`` so cardinalities come from HLL sketches — same
plan, bounded memory, no Expand fan-out.

Reference analog: the quality-check count queries (C4,
quality_checks.py) generalized from per-table hand-written SQL to any
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct) — one row per
    profiled column, computed in one aggregate job."""
    names = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nulls_{c}")
        )
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"_dist_{c}")
        )
    row = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(dtypes[c]).alias("dtype"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"_nulls_{c}").alias("n_nulls"),
                    F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                )
                for c in names
            ]
        )
    ).alias("p")
    return row.select(per_col).select(
        "p.column", "p.dtype", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry shape: exact profile of the events table (6 columns in
    one pass; the DuckDB twin recomputes each column's metrics)."""
    return profile(table(spark, sf_dir, "events"))


KS_ALPHA = 0.01


def ks_crit_coef_repr(alpha: float = KS_ALPHA) -> str:
    """repr() of the KS critical coefficient sqrt(-ln(alpha/2)/2) —
    embedded verbatim in the DuckDB oracle so both engines multiply
    the exact same double when deciding `drift`."""
    import math

    return repr(float(math.sqrt(-0.5 * math.log(alpha / 2))))


def value_drift_ks(
    spark: SparkSession, sf_dir: str, alpha: float = KS_ALPHA
) -> DataFrame:
    """Per-event-type Kolmogorov–Smirnov two-sample drift test: the
    first half of the date range is the reference window, the second
    half the comparison; flag types whose `value` distribution shifted.
    The continuous-distribution companion to the binned chi-square
    monitor (analytics.value_drift_by_bucket) — KS needs the full
    empirical CDFs, which is exactly the per-group computation SQL
    can't express cleanly and pandas can: this is the repo's
    grouped-map ``applyInPandas`` surface (each group's rows arrive as
    ONE pandas frame; numpy sorts both samples and takes the sup of
    the CDF gap).

    Scale posture: the shuffle is one hash partition per event_type;
    each group's values must fit one executor's frame — at 100 TB
    subsample per group first (KS statistics converge at ~10^5
    samples) with a deterministic content-hash filter, same plan
    shape.

    Oracle-paired (round 4): every number in the output is exactly
    reproducible — the window split compares integer epoch-microseconds
    (floor-div midpoint, no interval arithmetic), each CDF value is an
    integer count divided once in IEEE double, the sup is an exact max,
    and the drift verdict multiplies the same critical-coefficient
    literal by `sqrt` (correctly rounded per IEEE) of an integer ratio.
    The SQL twin mirrors each step with RANGE-peers-inclusive windows,
    so the hash matches bit-for-bit like PageRank and CMS do.
    """
    import math

    from ..pyfiles import ensure_shipped

    ensure_shipped(spark)
    e = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).head()
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    mid = lo + (hi - lo) // 2
    tagged = e.select(
        "event_type",
        "value",
        (F.unix_micros("ts") < F.lit(mid)).alias("is_ref"),
    )
    crit_coef = float(math.sqrt(-0.5 * math.log(alpha / 2)))

    def ks(pdf):
        import math

        import numpy as np
        import pandas as pd

        a = np.sort(pdf.loc[pdf["is_ref"], "value"].to_numpy(float))
        b = np.sort(pdf.loc[~pdf["is_ref"], "value"].to_numpy(float))
        n, m = len(a), len(b)
        if n == 0 or m == 0:
            stat, drift = float("nan"), False
        else:
            allv = np.concatenate([a, b])
            cdf_a = np.searchsorted(a, allv, side="right") / n
            cdf_b = np.searchsorted(b, allv, side="right") / m
            stat = float(np.abs(cdf_a - cdf_b).max())
            drift = stat > crit_coef * math.sqrt((n + m) / (n * m))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_ref": [n],
                "n_cur": [m],
                "ks_stat": [stat],
                "drift": [drift],
            }
        )

    return tagged.groupBy("event_type").applyInPandas(
        ks,
        "event_type string, n_ref long, n_cur long, ks_stat double, "
        "drift boolean",
    )
