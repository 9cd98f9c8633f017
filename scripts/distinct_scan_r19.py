#!/usr/bin/env python
"""r18-verdict item 3: mechanical scan of every registered op's
formatted physical plan for op20's distinct-rewrite pathology class —
Catalyst's RewriteDistinctAggregates building a wide per-key sketch /
accumulator buffer because a distinct aggregate is mixed with
non-distinct ones in a single keyed Aggregate.

Signatures scanned per plan (sf0.001, cold build — same conditions as
scripts/plan_audit.py):

  keyed_partial_sketch : a HashAggregate/ObjectHashAggregate whose
      Keys list is non-empty AND whose Functions list carries a
      partial_approx_count_distinct / partial_approx_percentile /
      partial_percentile / partial_hll — the exact shape that cost
      op20 4.2 s (one ~1536-slot interpreted HLL buffer per key).
  expand_distinct      : an Expand node feeding an aggregate with a
      distinct function — the multi-distinct rewrite that multiplies
      input rows by the number of distinct groups.
  keyed_collect        : keyed partial collect_list/collect_set over
      a non-trivial child (informational — TypedImperative per-key
      buffers; expected for the documented collect ops).

Writes plans/r19/distinct_scan.json and prints a summary table.
Usage: python scripts/distinct_scan_r19.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# a keyed aggregate block in formatted explain:
#   (N) HashAggregate ... / Keys [k]: [...] / Functions [m]: [...]
_AGG_BLOCK = re.compile(
    r"\((\d+)\) (Object)?HashAggregate[^\n]*\n(?:[^\n]*\n)*?"
    r"Keys \[\d+\]: \[([^\]]*)\][^\n]*\n"
    r"Functions \[\d+\]: \[([^\]]*)\]"
)
_SKETCH_FNS = (
    "approx_count_distinct",
    "approx_percentile",
    "percentile",
    "hyperloglog",
    "hll_sketch",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from ocdb_server_spark.registry import load_all
    from ocdb_server_spark.session import get_spark

    spark = get_spark(app_name="distinct_scan_r19", profile="interactive")
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all()

    findings: dict[str, dict] = {}
    n_err = 0
    for i, (name, op) in enumerate(sorted(ops.items())):
        try:
            df = op.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep scanning
            findings[name] = {"err": f"{type(e).__name__}: {e}"[:160]}
            n_err += 1
            continue
        rec: dict[str, list | bool] = {}
        keyed_sketch, keyed_collect = [], []
        for m in _AGG_BLOCK.finditer(plan):
            node, keys, fns = m.group(1), m.group(3).strip(), m.group(4)
            if not keys:
                continue  # keyless sketches are the fixed op20 shape
            if any(s in fns for s in _SKETCH_FNS):
                keyed_sketch.append(f"node {node}: keys=[{keys[:60]}] fns=[{fns[:90]}]")
            if "partial_collect_" in fns:
                keyed_collect.append(f"node {node}: keys=[{keys[:60]}]")
        if keyed_sketch:
            rec["keyed_partial_sketch"] = keyed_sketch
        if "Expand" in plan and "distinct" in plan:
            rec["expand_distinct"] = True
        if keyed_collect:
            rec["keyed_collect"] = keyed_collect
        if rec:
            findings[name] = rec
        if (i + 1) % 50 == 0:
            print(f"... scanned {i + 1}/{len(ops)}", flush=True)

    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r19",
        "distinct_scan.json",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(
            {"scanned": len(ops), "errors": n_err, "findings": findings},
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {dest}: {len(ops)} scanned, {n_err} errors")
    for name, rec in sorted(findings.items()):
        print(f"  {name}: {json.dumps(rec)[:200]}")


if __name__ == "__main__":
    main()
