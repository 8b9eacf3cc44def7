#!/usr/bin/env python
"""Propose the next round's `registry._PRIORITY` slate from witness
history — makes the standing per-round rotation ask mechanical.

Policy (the convention VERDICT r2-r10 converged on):
  1. the 5 subsystem sentinels stay at the front every round;
  2. queries that have EVER failed a driver check go next (none so
     far in ten rounds, but the slot order is reserved);
  3. never-driver-witnessed queries (new registrations) go next;
  4. the remaining slots fill stalest-witness-first, so every
     query's driver row keeps getting refreshed on a bounded cycle;
  5. positions 51+ pre-queue the following round (next-stalest).

Reads CORRECTNESS_r*.json (the driver's own records — ground truth
for what it witnessed) and prints a ready-to-paste Python list plus
a staleness histogram. Advisory only: it does NOT edit registry.py,
because each round's slate deserves a human look (e.g. promoting a
rewritten query for re-witness even though its old row is fresh).

Usage: python scripts/rotate_slate.py [slate_size=50] [queue_extra=32]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINELS = [
    "agg_groupby",
    "win_frame_range",
    "stream_tumbling",
    "fn_json",
    "join_asof",
]


def witness_history(root: str) -> dict[str, tuple[int, bool]]:
    """query -> (latest round witnessed, latest check was clean)."""
    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            d = json.load(fh)
        for name, row in d.items():
            if not isinstance(row, dict):
                continue
            # rows-only queries record err="no_oracle" with a row
            # count — that is a CLEAN run, not a failure
            err = row.get("err")
            ok = (
                (err is None or err == "no_oracle")
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, ok)
    return latest


def main() -> int:
    slate_size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    queue_extra = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from infofarmsparkml_spark import registry

    names = list(registry.queries())
    hist = witness_history(root)

    failed = [
        n for n in names if n in hist and not hist[n][1] and n not in SENTINELS
    ]
    never = [n for n in names if n not in hist and n not in SENTINELS]
    rest = [
        n
        for n in names
        if n in hist and hist[n][1] and n not in SENTINELS
    ]
    # stalest first; registry order breaks ties deterministically
    rest.sort(key=lambda n: hist[n][0])

    ordered = SENTINELS + failed + never + rest
    slate = ordered[:slate_size]
    queue = ordered[slate_size : slate_size + queue_extra]

    by_round: dict[int, int] = {}
    for n in names:
        by_round[hist.get(n, (0,))[0]] = by_round.get(hist.get(n, (0,))[0], 0) + 1
    print("# staleness histogram (latest witness round -> #queries):")
    for rnd in sorted(by_round):
        label = "never" if rnd == 0 else f"r{rnd}"
        print(f"#   {label}: {by_round[rnd]}")
    if failed:
        print(f"# FAILED LAST CHECK (slate front): {failed}")
    if never:
        print(f"# never witnessed (after sentinels): {never}")

    def fmt(block: list[str]) -> str:
        lines, cur = [], "   "
        for n in block:
            tok = f' "{n}",'
            if len(cur) + len(tok) > 78:
                lines.append(cur)
                cur = "   "
            cur += tok
        if cur.strip():
            lines.append(cur)
        return "\n".join(lines)

    print("_PRIORITY: list[str] = [")
    print("    # sentinels (re-run every round)")
    print(fmt(SENTINELS))
    print("    # slate (stalest-witness-first)")
    print(fmt([n for n in slate if n not in SENTINELS]))
    print(f"    # ---- position {slate_size + 1}+: next-round queue ----")
    print(fmt(queue))
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
