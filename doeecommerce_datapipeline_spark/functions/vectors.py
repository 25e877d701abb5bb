"""Vector expressions over array<float> embedding columns.

Built-in higher-order functions only (zip_with / aggregate / transform)
— the arithmetic stays JVM-side and inside codegen; no UDF transfer.

Determinism: every fold is an in-order left fold over the array, so the
double arithmetic is bit-reproducible on any engine that folds lists in
element order (DuckDB's list_aggregate does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product: in-order fold of elementwise double products."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def vec_mean(a: Column | str) -> Column:
    """Mean of elements (in-order fold / size)."""
    s = F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return F.when(F.size(_c(a)) > 0, s / F.size(_c(a)))
