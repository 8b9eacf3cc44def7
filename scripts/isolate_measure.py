#!/usr/bin/env python
"""Single-op, single-scale, fresh-JVM wall-time measure — the
isolation treatment the r11/r12 smokes converged on for adjudicating
in-sweep outliers: accumulated single-JVM heap/code-cache state
swings same-code sf10 legs up to ~3x (SCALE_SMOKE_r12 notes), so any
ratio worth a verdict gets re-measured in its own process.

Usage: python scripts/isolate_measure.py <query_name> <sf_dir>
Prints one JSON line: {op, sf_dir, warm_sec, op_sec, loadavg_1m}.

The co-purchase edge scratch (shared by every graph op) is warmed
first via graph_degree and timed separately, so the measured op never
pays the one-time fixture materialization inside its number (the same
edges_warm_sec discipline as scripts/scale_smoke2.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    op, sf_dir = sys.argv[1], sys.argv[2]
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name=f"isolate-{op}")
    spark.sparkContext.setLogLevel("ERROR")

    warm_sec = None
    if op.startswith("graph_"):
        deg_fn, _ = registry.get("graph_degree")
        t = time.time()
        deg_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm_sec = round(time.time() - t, 2)

    fn, _ = registry.get(op)
    t = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    op_sec = round(time.time() - t, 2)
    print(json.dumps({
        "op": op, "sf_dir": sf_dir, "warm_sec": warm_sec,
        "op_sec": op_sec,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
