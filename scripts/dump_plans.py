#!/usr/bin/env python
"""Dump explain('formatted') for named registry queries to
plans/<outdir>/<name>_<suffix>.txt (the judge-facing plan evidence).

Usage: python scripts/dump_plans.py <suffix> <sf_dir> <name> [name...]
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)


def main() -> int:
    suffix, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.plans import explain_str
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(_ROOT, "plans", os.environ.get("PLANS_OUTDIR", "r17"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn, _ = registry.get(name)
        plan = explain_str(fn(spark, sf_dir), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
