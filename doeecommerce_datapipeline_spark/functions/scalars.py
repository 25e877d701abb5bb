"""Scalar/aggregate expression helpers (SURVEY.md §2.8 F1–F17).

Reference analogs are pandas idioms (e.g. ``.str.lower().str.strip()``
at ingestion/dummyjson_ingestor.py:570-577, guarded division at
database/layers/silver/transform_silver.py:73-77). All are rebuilt as
JVM-side Column expressions — no Python UDFs in the hot path.

Determinism note (oracle parity at any scale): floating-point SUM/AVG
is summation-order-dependent, so distributed results differ run-to-run
and engine-to-engine. Money aggregates therefore cast every element to
DECIMAL before summing (exact, order-independent); averages divide the
exact decimal sum by the count in one IEEE double division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec_sum(col: Column | str, scale: str = MONEY) -> Column:
    """Exact, order-independent SUM: cast elements to decimal first."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale))


def dec_to_double_split(col: Column) -> Column:
    """Engine-agreed decimal→double conversion for sums whose scaled
    digits exceed 2^53 — the boundary past which engines' native
    int128→double conversions double-round differently by 1 ulp (the
    r9 sf1 sweep's pricing_summary/haar class).

    The exact decimal is split into three 2^26-limbs (l0, h1, h2 with
    value = (h2·2^26 + h1)·2^26 + l0); each limb is < 2^53 so its own
    double cast is EXACT, and the recombine is a fixed IEEE dag
    (power-of-two scalings are exact; two rounded adds) that every
    engine evaluates identically when the twin mirrors the same
    expression. Valid while |value| < 2^105 ≈ 4e31 (h2 must stay
    under 2^53) — five orders beyond a 100 TB-scale money sum.
    Verified correctly-rounded on boundary values (2^53+1, ~1e22) on
    both engines. Intended for nonnegative sums (sums of squares);
    the limb identity also holds for negatives since both engines'
    `%` is dividend-signed."""
    m = F.lit(1 << 26).cast("decimal(38,0)")
    l0 = col % m
    r1 = (col - l0) / m
    h1 = r1 % m
    h2 = (r1 - h1) / m
    return (
        h2.cast("double") * F.lit(float(1 << 26)) + h1.cast("double")
    ) * F.lit(float(1 << 26)) + l0.cast("double")


def dec_to_double_split_sql(expr: str) -> str:
    """The DuckDB mirror of dec_to_double_split — the SAME limb dag,
    textually, so a twin can convert an over-2^53 decimal sum to the
    bit-identical double."""
    return (
        f"((CAST(((({expr}) - ({expr}) % 67108864) / 67108864"
        f" - ((({expr}) - ({expr}) % 67108864) / 67108864) % 67108864)"
        f" / 67108864 AS DOUBLE) * 67108864.0"
        f" + CAST(((({expr}) - ({expr}) % 67108864) / 67108864) % 67108864"
        f" AS DOUBLE)) * 67108864.0 + CAST(({expr}) % 67108864 AS DOUBLE))"
    )


def lattice_sum_6dp(col: Column) -> Column:
    """Order-free, engine-agreed moment sum for double-valued terms:
    each term is quantized on the explicit floor(v·1e6 + 0.5) lattice
    (the SAME IEEE dag on every engine — unlike a double→decimal
    CAST, whose rounding algorithm is engine-specific and diverges in
    the boundary zone at large magnitudes), then summed as an exact
    DECIMAL(38,0) integer. Convert the result with
    dec_to_double_split(...) / 1e6. The companion SQL builder is
    lattice_sum_6dp_sql. Spark's floor(double) lands in a LONG, so
    terms must stay under ~9.2e12 — prescale large variables first
    (the adf/granger faces divide money series by 2^20)."""
    return F.sum(
        F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("decimal(38,0)")
    )


def lattice_sum_6dp_sql(expr: str) -> str:
    """DuckDB mirror of lattice_sum_6dp — same lattice dag, so the
    per-term quantization agrees bit-for-bit with the Spark face."""
    return f"SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS DECIMAL(38,0)))"


def dsum(col: Column | str, scale: str = MONEY) -> Column:
    """Order-independent SUM surfaced as DOUBLE.

    The exact decimal sum is converted to double once at the end — a
    single deterministic conversion — so the output schema is plain
    DOUBLE on every engine while the arithmetic stays exact.
    """
    return dec_sum(col, scale).cast("double")


def exact_avg(col: Column | str, scale: str = MONEY) -> Column:
    """Deterministic AVG: double(exact decimal sum) / count.

    One IEEE-754 division on two exactly-reproducible operands — the
    result is bit-identical regardless of row order or partitioning.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale).cast("double") / F.count(c)


def norm_email(col: Column | str) -> Column:
    """F1: lower + trim (dummyjson_ingestor.py:570-577)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def full_name(first: Column | str, last: Column | str) -> Column:
    """F2: null-safe 'first last' concat (transform_silver.py:57-58)."""
    f = F.col(first) if isinstance(first, str) else first
    l = F.col(last) if isinstance(last, str) else last
    return F.trim(
        F.concat_ws(" ", F.coalesce(f, F.lit("")), F.coalesce(l, F.lit("")))
    )


EMAIL_RE = r"^[\w.+-]+@[\w.-]+\.\w{2,}$"


def is_valid_email(col: Column | str) -> Column:
    """F4: email regex (database/layers/bronze/validator.py:47-53)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(EMAIL_RE)


def clean_phone(col: Column | str) -> Column:
    """F5: strip non-phone chars (randomuser_ingestor.py:254-255)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^\d\-\+\s]", "")


def guarded_pct(total: Column | str, discounted: Column | str) -> Column:
    """F11: zero-guarded discount percentage
    (transform_silver.py:73-77): when total>0 → round((total-disc)/total*100, 2) else 0.
    Computed in decimal so the rounding is exact and order-free.
    """
    t = (F.col(total) if isinstance(total, str) else total).cast("decimal(18,6)")
    d = (F.col(discounted) if isinstance(discounted, str) else discounted).cast(
        "decimal(18,6)"
    )
    pct = ((t - d) / t * 100).cast("decimal(18,2)")
    return F.when(t > 0, pct).otherwise(F.lit("0.00").cast("decimal(18,2)"))


def age_bucket(col: Column | str) -> Column:
    """F16: categorical binning, bins [0,18,35,50,65,150]
    (randomuser_ingestor.py:258-264). Chained WHEN keeps it codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c <= 18, "0-18")
        .when(c <= 35, "19-35")
        .when(c <= 50, "36-50")
        .when(c <= 65, "51-65")
        .otherwise("65+")
    )
