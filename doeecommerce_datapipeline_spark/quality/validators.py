"""Ingest-time validation predicates (SURVEY.md §2.2 P9).

The reference validates per-source with fail-the-batch semantics
(fakestore_ingestor.py:100-163, dummyjson_ingestor.py:126-236,
randomuser_ingestor.py:104-192, bronze/validator.py:15-63). Here each
rule is a Column predicate; `quarantine_split` partitions a batch into
(clean, rejected-with-reason) in one pass — the distributed quarantine
pattern instead of failing the whole batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import EMAIL_RE


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # True == valid


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def non_negative(col: str) -> Rule:
    """Money must be ≥ 0 (validator.py:19-34)."""
    return Rule(f"{col}_non_negative", F.col(col).isNull() | (F.col(col) >= 0))


def valid_email(col: str) -> Rule:
    """Email format (validator.py:47-53). Validated on the trimmed
    value — raw feeds arrive padded, and quarantining rows the silver
    normalizer (F1 lower+trim) would fix anyway is false rejection."""
    return Rule(
        f"{col}_valid_email",
        F.col(col).isNull() | F.trim(F.col(col)).rlike(EMAIL_RE),
    )


def in_range(col: str, lo, hi) -> Rule:
    """e.g. age 0–150 (randomuser_ingestor.py:157-160)."""
    return Rule(
        f"{col}_in_range", F.col(col).isNull() | F.col(col).between(lo, hi)
    )


def isin(col: str, values: list[str]) -> Rule:
    """e.g. gender ∈ {male, female} (randomuser_ingestor.py:163-167)."""
    return Rule(f"{col}_isin", F.col(col).isNull() | F.col(col).isin(values))


def quarantine_split(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """One-pass split into (clean, quarantined+reasons).

    The reasons column lists every violated rule — an array built from
    the same predicates, so the scan is shared (no second pass)."""
    reasons = F.array_compact(
        F.array(
            *[F.when(~r.predicate, F.lit(r.name)) for r in rules]
        )
    )
    tagged = df.withColumn("_violations", reasons)
    clean = tagged.where(F.size("_violations") == 0).drop("_violations")
    bad = tagged.where(F.size("_violations") > 0)
    return clean, bad


def duplicate_ids(df: DataFrame, key: str) -> DataFrame:
    """Duplicate-id detection (fakestore_ingestor.py:130-140) as an
    aggregate — the keys appearing more than once in the batch."""
    return df.groupBy(key).count().where(F.col("count") > 1).drop("count")
