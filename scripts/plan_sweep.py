#!/usr/bin/env python
"""Full-registry physical-plan anti-pattern sweep (r16, guide §7.2).

Builds every registry query's DataFrame (no action except what the
operator itself runs on construction) and greps the formatted plan
for the guide's red flags:

  - BatchEvalPython          (row-at-a-time Python UDF, guide §4)
  - CartesianProduct / BroadcastNestedLoopJoin (guide §3)
  - Exchange count           (shuffles, guide §2)
  - SortMergeJoin count      (candidate for broadcast/SHJ, guide §3.1)
  - parquet scans whose ReadSchema is the full table width while a
    Project above uses fewer columns (column-pruning misses)
  - duplicate Python-eval of the same UDF (guide §4.4)

Output: one JSON with per-query counters, so optimization targets can
be ranked together with the wall-time profile. Plan-only: streaming
ops and eager ops (localCheckpoint kernels) do execute their
construction-time work, which is why this runs at sf0.001 by default.

Usage: python scripts/plan_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

FLAGS = [
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "Exchange",
    "Window",
    "Generate",
    "InMemoryTableScan",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_SWEEP_r16.json"
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.plans import explain_str
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    rows: dict[str, dict] = {}
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = explain_str(df, "formatted")
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        r = {f: plan.count(f) for f in FLAGS}
        # Exchange double-counts reuse lines ("ReusedExchange") — split out
        r["ReusedExchange"] = plan.count("ReusedExchange")
        r["Exchange"] -= r["ReusedExchange"]
        # scans with no pushed filters although the query filters
        r["scans"] = plan.count("Scan parquet")
        r["pushed_none"] = len(re.findall(r"PushedFilters: \[\]", plan))
        rows[name] = {k: v for k, v in r.items() if v}
        # cleanup lingering state between queries (cheap at sf0.001)
        spark.catalog.clearCache()
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "rows": rows}, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
