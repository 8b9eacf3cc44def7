#!/usr/bin/env python
"""Cold-start decomposition for `llm_knn_join` (r16, VERDICT r15
#6): KNN_COST_r15 measured fresh-JVM 13.1 s at sf0.01 vs ~8 s warm
median vs ~2 s for the bare pipeline — this script attributes the
constant, phase by phase, in fresh subprocess JVMs:

  session   getOrCreate() (JVM launch + context init)
  prewarm   (variant B only) one trivial Arrow pandas-UDF roundtrip
            over 1k rows — isolates Python/Arrow worker spin-up
            from the operator's own first UDF stage
  count     embeddings read + count (the `_adaptive_band_bits`
            input the operator computes first)
  construct calling the registered fn: builds the plan AND fires
            the eager localCheckpoint (signature UDF + bucket join
            + distance + distinct — the heavy half)
  collect   mirror union + top-5 window over the checkpointed pairs

Variant A (cold) vs variant B (prewarmed Arrow workers): the
construct-phase difference is the worker spin-up share; if
session+spinup dominate the 13 s, the constant is environmental
(JVM + Python worker pool), not the operator — the decision input
the VERDICT asked for before attempting a codegen SRP rewrite
(which the 17-bit regime forbids anyway: 16 bands x 17 bits x
64-term dots ≈ 17k expression nodes, past the codegen cliff
documented at operators/llm.py::_srp_band_keys).

Writes KNN_COLD_r{N}.json. Usage:
  python scripts/knn_cold_decomp.py [round=16]
  python scripts/knn_cold_decomp.py --child <sf_dir> <prewarm:0|1>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"


def child(sf_dir: str, prewarm: bool) -> None:
    t = {}
    t0 = time.time()
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("knn-cold-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    t["session"] = time.time() - t0

    if prewarm:
        t0 = time.time()
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        @F.pandas_udf(LongType())
        def _noop(s: pd.Series) -> pd.Series:
            return s

        spark.range(1000).select(_noop("id")).collect()
        t["prewarm"] = time.time() - t0

    t0 = time.time()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    t["count"] = time.time() - t0

    from infofarmsparkml_spark import registry

    fn, _ = registry.get("llm_knn_join")
    t0 = time.time()
    df = fn(spark, sf_dir)  # eager checkpoint fires here
    t["construct"] = time.time() - t0
    t0 = time.time()
    rows = df.collect()
    t["collect"] = time.time() - t0
    t["total"] = round(sum(t.values()), 2)
    t = {k: round(v, 2) for k, v in t.items()}
    t.update({"n": n, "rows": len(rows), "prewarmed": prewarm})
    print("KNN_DECOMP " + json.dumps(t))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3] == "1")
        return 0
    rnd = sys.argv[1] if len(sys.argv) > 1 else "16"
    out = {"round": rnd, "sf_dir": SF,
           "loadavg_1m_start": round(os.getloadavg()[0], 2)}
    for label, pw in (("cold", "0"), ("prewarmed", "1")):
        runs = []
        for _ in range(3):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", SF, pw],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("KNN_DECOMP ")]
            if p.returncode != 0 or not line:
                print(p.stderr[-2000:])
                raise RuntimeError(f"child failed ({label})")
            runs.append(json.loads(line[0][len("KNN_DECOMP "):]))
            print(f"# {label}: {runs[-1]}")
        out[label] = runs
    # attribute: construct_cold - construct_prewarmed ~ Arrow worker
    # spin-up inside the operator's first UDF stage
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    cc = med([r["construct"] for r in out["cold"]])
    cp = med([r["construct"] for r in out["prewarmed"]])
    out["attribution"] = {
        "construct_cold_median": cc,
        "construct_prewarmed_median": cp,
        "arrow_spinup_share_sec": round(cc - cp, 2),
        "session_median": med([r["session"] for r in out["cold"]]),
        "total_cold_median": med([r["total"] for r in out["cold"]]),
    }
    path = os.path.join(REPO, f"KNN_COLD_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
