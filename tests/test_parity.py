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


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
