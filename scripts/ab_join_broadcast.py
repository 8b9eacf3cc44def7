#!/usr/bin/env python
"""VERDICT r16 #1: settle join_broadcast with a clean interleaved
A/B at sf0.1 AND sf1 (10 disjoint key-shifted copies, built by
scripts/scale_smoke.py). Arms:

  chained  — the pre-r16 shape: lineitem probes three chained
             broadcast dims (supplier → nation → region).
  flattened — the r16 shape (current registry): supplier⋈nation⋈
             region pre-flattened into one 3-col broadcast dim;
             the fact row pays one probe.

Decision rule (VERDICT): keep flattened only on a confirmed >=5%
min-statistic win at sf1; otherwise revert the headline op to the
chained form. Result equality asserted per scale.

Usage: python scripts/ab_join_broadcast.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/infofarmsparkml_sf1"


def chained(spark, sf_dir):
    from infofarmsparkml_spark.operators._util import (
        load_table,
        net_cents,
        sum_cents,
    )

    lf = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        lf.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            sum_cents(net_cents(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("ab-join-broadcast")
    spark.sparkContext.setLogLevel("ERROR")
    flattened, _ = registry.get("join_broadcast")
    out: dict[str, dict] = {}
    for label, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]:
        if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
            print(f"{label}: fixture missing at {sf_dir}, skipping")
            continue
        a = sorted(map(tuple, chained(spark, sf_dir).collect()))
        b = sorted(map(tuple, flattened(spark, sf_dir).collect()))
        assert a == b, f"{label}: results differ"
        print(f"{label}: results identical ({len(a)} rows)", flush=True)
        ch, fl = [], []
        for i in range(rounds):
            spark.sparkContext.setJobDescription(f"jb chained {label} r{i}")
            ch.append(timed(chained, spark, sf_dir))
            spark.sparkContext.setJobDescription(f"jb flattened {label} r{i}")
            fl.append(timed(flattened, spark, sf_dir))
            print(
                f"  {label} round {i}: chained {ch[-1]:.3f}s "
                f"flattened {fl[-1]:.3f}s",
                flush=True,
            )
        out[label] = {
            "chained": [round(x, 3) for x in ch],
            "flattened": [round(x, 3) for x in fl],
            "chained_min": round(min(ch), 3),
            "flattened_min": round(min(fl), 3),
            "chained_median": round(sorted(ch)[len(ch) // 2], 3),
            "flattened_median": round(sorted(fl)[len(fl) // 2], 3),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
