#!/usr/bin/env python
"""Idle-host headline bench (VERDICT r14 #2: commit BENCH_IDLE_r{N}
every round that touches a headline query's expression tree — and
never skip it again). Runs bench.py back-to-back N times on an
otherwise-idle host, reports every run, and writes the BEST run (by
same-17 subtotal — the 17 queries the r1 baseline measured; the
headline list has since grown to 20) as BENCH_IDLE_r{N}.json in the
same shape as bench.py's line plus the ratio fields.

Usage: python scripts/idle_bench.py [round_number] [n_runs=4]
Always writes the artifact; if sitting load_start is missing or
>= 0.5 it carries a 'not a clean idle sitting' warning note so the
attempt is visible but clearly marked (ADVICE r15: 0.0 is a valid
clean reading, not a missing one).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)

R1_BASELINE = {
    "agg_groupby": 0.672, "agg_grouping_sets": 0.424,
    "scan_projected": 0.178, "join_broadcast": 0.701,
    "join_sortmerge": 0.589, "join_asof": 0.4,
    "win_topk_per_group": 0.328, "limit_topk": 0.13,
    "ml_word_count": 0.186, "llm_exact_dedup": 0.172,
    "llm_cosine_topk": 0.523, "udf_scalar_arrow": 0.368,
    "fn_array": 0.439, "tpch_q3": 0.624, "tpch_q6": 0.195,
    "tpch_q18": 0.494, "sql_correlated_scalar": 0.285,
}
R1_TOTAL = 6.708


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    runs = []
    for i in range(n_runs):
        r = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "bench.py")],
            capture_output=True, text=True, check=True,
        )
        line = [
            ln for ln in r.stdout.strip().splitlines()
            if ln.startswith("{")
        ][-1]
        d = json.loads(line)
        d["same17_sec"] = round(
            sum(d["queries"][k] for k in R1_BASELINE), 3
        )
        d["same17_vs_r1"] = round(d["same17_sec"] / R1_TOTAL, 3)
        runs.append(d)
        print(json.dumps({
            "run": i + 1, "total": d["value"],
            "same17": d["same17_sec"], "ratio": d["same17_vs_r1"],
            "load_start": d.get("loadavg_1m_start"),
        }), file=sys.stderr, flush=True)

    best = min(runs, key=lambda d: d["same17_sec"])
    best = dict(best)
    # back-to-back runs see their own self-load in loadavg: the
    # sitting's idleness is RUN 1's load_start, not the best run's
    sitting_load = runs[0].get("loadavg_1m_start")
    best["sitting_load_start"] = sitting_load
    best["note"] = (
        f"best of {n_runs} back-to-back idle runs (sitting "
        f"load_start {sitting_load}; later runs' loadavg is the "
        f"bench's own self-load); same-17 "
        f"{best['same17_sec']} s = {best['same17_vs_r1']}x the r1 "
        f"baseline ({R1_TOTAL} s). All runs (same17/ratio/load): "
        + "; ".join(
            f"{d['same17_sec']}/{d['same17_vs_r1']}/"
            f"{d.get('loadavg_1m_start')}" for d in runs
        )
    )
    if sitting_load is None or sitting_load >= 0.5:
        best["note"] += (
            " WARNING: sitting load_start >= 0.5 — not a clean "
            "idle sitting; rerun on an idle host."
        )
    path = os.path.join(_ROOT, f"BENCH_IDLE_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(best, f, indent=1)
    print(json.dumps(best))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
