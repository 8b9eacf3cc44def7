#!/usr/bin/env python
"""r17 probe: graph_triangles' degree table feeds BOTH broadcast
sides of the orientation join, and exchange reuse does not fire
across BroadcastExchanges (the minhash defect class), so the
union+groupBy over the edge set runs twice — 4 RDD passes over und
instead of 2. Probe: checkpoint deg (vertex-sized) so it builds
once. Interleaved A/B, result equality asserted.

Usage: python scripts/ab_tri_deg.py [rounds=7]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def new_triangles(spark, sf_dir):
    from infofarmsparkml_spark.operators.graph import _copurchase_edges

    und = (
        _copurchase_edges(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()  # <-- the probe: build degrees once
    )
    ranked = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    fwd = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("d"),
    ).localCheckpoint()
    e1 = fwd.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = fwd.select(F.col("s").alias("b"), F.col("d").alias("c")).hint(
        "shuffle_hash"
    )
    e3 = fwd.select(F.col("s").alias("a"), F.col("d").alias("c")).hint(
        "shuffle_hash"
    )
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy(F.col("node").alias("part")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("ab-tri-deg")
    spark.sparkContext.setLogLevel("ERROR")
    old_fn, _ = registry.get("graph_triangles")
    a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, new_triangles(spark, SF_DIR).collect()))
    assert a == b, f"results differ ({len(a)} vs {len(b)})"
    print(f"results identical ({len(a)} rows)", flush=True)
    olds, news = [], []
    for i in range(rounds):
        olds.append(timed(old_fn, spark))
        news.append(timed(new_triangles, spark))
        print(f"round {i}: old {olds[-1]:.3f}s new {news[-1]:.3f}s", flush=True)
    out = {
        "old_min": round(min(olds), 3),
        "new_min": round(min(news), 3),
        "old_median": round(sorted(olds)[len(olds) // 2], 3),
        "new_median": round(sorted(news)[len(news) // 2], 3),
        "old": [round(x, 3) for x in olds],
        "new": [round(x, 3) for x in news],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
