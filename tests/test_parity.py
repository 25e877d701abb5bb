"""Every queries() entry with an oracle must hash-match it at sf0.001.

This is the same gate the driver runs at sf0.01 — catching drift here
is the whole point of the test.
"""

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_driver_hashable(name, spark, sf_dir):
    """The driver canonicalizes (pandas sort + value hash) EVERY
    registry entry's output — rows-only ones included. A raw
    array/map/struct column crashes that step (round 4's
    pca_embeddings red row: `TypeError: unhashable type: 'list'`), so
    every rows-only face must emit scalars only. Mirror the driver's
    canonicalization here so the failure is caught at sf0.001 in CI,
    not in the driver window."""
    import pandas as pd

    pdf = QUERIES[name](spark, sf_dir).toPandas()
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pd.util.hash_pandas_object(pdf, index=False)


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
