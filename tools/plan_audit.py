"""Plan audit: walk every registry query, extract the physical-plan
properties PLANS.md claims, and emit one JSON line per query — the
automated evidence behind the per-operator plan notes.

Usage:  python tools/plan_audit.py [sf_dir] > PLANS_AUDIT.json

Counts come from `explain("formatted")`, which mentions each node
twice (tree + detail section), so raw counts are halved. Flags:

- exchanges / broadcasts: shuffle count is THE scale currency
- scans + pushed: whether any parquet scan carries PushedFilters
- bhj / smj / bnlj: join strategy mix (BNLJ is fine only for
  single-row broadcast builds — audited by the `bnlj` count being
  small and deliberate)
- codegen: WholeStageCodegen span count (wider = more fused)
- rowsort: global Sort nodes outside TakeOrderedAndProject (a global
  sort on fact data is a red flag; top-k shapes don't need one)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from doeecommerce_datapipeline_spark.session import get_spark  # noqa: E402


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()

    def n(tok: str) -> int:
        return p.count(tok) // 2

    return {
        "exchanges": n("Exchange") - n("BroadcastExchange"),
        "broadcasts": n("BroadcastExchange"),
        "scans": n("Scan parquet"),
        "pushed_filters": "PushedFilters: [" in p
        and "PushedFilters: []" not in p,
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "generates": n("Generate"),
        "codegen_spans": n("WholeStageCodegen"),
        "sorts": n("Sort "),
        "topk": n("TakeOrderedAndProject"),
        "windows": n("Window"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            out[name] = audit_plan(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic path
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
