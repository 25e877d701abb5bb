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
