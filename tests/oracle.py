"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values. Used by
tests/test_parity.py so oracle drift is caught before the driver runs
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from doeecommerce_datapipeline_spark.io import TABLES


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatch in any bit is real
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    o_cols, o_rows = run_oracle(sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    s_set = _rowset(s_cols, [[r[c] for c in s_cols] for r in s_rows])
    o_set = _rowset(o_cols, o_rows)
    if s_set != o_set:
        only_s = [r for r in s_set if r not in set(map(tuple, o_set))][:3]
        only_o = [r for r in o_set if r not in set(map(tuple, s_set))][:3]
        problems.append(
            f"values differ; spark-only sample={only_s} oracle-only sample={only_o}"
        )
    return problems
