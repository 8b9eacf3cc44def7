#!/usr/bin/env python
"""r17 probe: does checkpointing the oriented edge set `o` inside
_star_contract (consumed by sm AND both cur branches — the same
multi-consumer re-derivation class as the triangles union) pay at
bench scale? Interleaved A/B, result equality asserted.

Usage: python scripts/ab_ccstar.py [rounds=7]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _star_contract_ckpt(sym: DataFrame):
    prev = (
        sym.filter(F.col("u") > F.col("v"))
        .select(F.col("u").alias("h"), F.col("v").alias("l"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(16):
        rounds += 1
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        o = (
            large.select(
                F.greatest("a", "b").alias("h"), F.least("a", "b").alias("l")
            )
            .distinct()
            .localCheckpoint(eager=True)  # <-- the probe
        )
        sm = o.groupBy("h").agg(F.min("l").alias("m"))
        cur = (
            o.join(sm, "h")
            .filter(F.col("l") != F.col("m"))
            .select(F.col("l").alias("h"), F.col("m").alias("l"))
            .union(sm.select(F.col("h"), F.col("m").alias("l")))
            .select(
                F.greatest("h", "l").alias("h"), F.least("h", "l").alias("l")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = prev.subtract(cur).union(cur.subtract(prev)).isEmpty()
        prev = cur
        if converged:
            break
        sym = cur.select(F.col("h").alias("u"), F.col("l").alias("v")).union(
            cur.select(F.col("l").alias("u"), F.col("h").alias("v"))
        )
    return prev, rounds


def new_cc_star(spark, sf_dir):
    from infofarmsparkml_spark.operators._util import load_table
    from infofarmsparkml_spark.operators.llm import _signature_edges

    docs = load_table(spark, sf_dir, "documents")
    sym = _signature_edges(spark, sf_dir).localCheckpoint(eager=True)
    stars, _ = _star_contract_ckpt(sym)
    stars = stars.select(F.col("h").alias("doc_id"), F.col("l").alias("comp"))
    return (
        docs.select("doc_id")
        .join(stars, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id"))
            .cast("long")
            .alias("component"),
        )
    )


def timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("ab-ccstar")
    spark.sparkContext.setLogLevel("ERROR")
    old_fn, _ = registry.get("graph_cc_star")
    a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, new_cc_star(spark, SF_DIR).collect()))
    assert a == b, f"results differ ({len(a)} vs {len(b)})"
    print(f"results identical ({len(a)} rows)", flush=True)
    olds, news = [], []
    for i in range(rounds):
        olds.append(timed(old_fn, spark))
        news.append(timed(new_cc_star, spark))
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
