#!/usr/bin/env python
"""Round-17 interleaved A/B: old vs new shapes for the three
structural changes (graph_triangles corners-explode,
agg_count_min_topk sketch-from-truth, llm_minhash_lsh_dedup
bucket-explode candidates).

Protocol (r16, memory): ONE session, interleaved arms (old, new,
old, new, ...), result equality asserted by sorted-row comparison,
MIN over >=7 rounds is the noise-robust statistic on this bursty
host. Build + noop-sink execution both inside the timed region
(bench.py methodology).

Usage: python scripts/ab_r17.py [op ...]   (default: all three)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "7"))


# ---------- old shapes (pre-r17, from git HEAD) ----------

def old_graph_triangles(spark, sf_dir):
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
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy(F.col("node").alias("part")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def old_agg_count_min_topk(spark, sf_dir):
    from infofarmsparkml_spark.operators._util import load_table

    width = 64
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    r_col = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    col = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit("_"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    hashed = li.select("k", r_col).withColumn("col", col)
    sketch = hashed.groupBy("r", "col").agg(F.count(F.lit(1)).alias("cnt"))
    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    cand = truth.select("k", "true_count", r_col).withColumn("col", col)
    est = (
        cand.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("k", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return (
        est.select(
            F.col("k").alias("part"),
            "cm_estimate",
            "true_count",
            (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("cm_estimate"), "part")
        .limit(10)
    )


def old_llm_minhash_lsh_dedup(spark, sf_dir):
    from infofarmsparkml_spark.operators._util import load_table
    from infofarmsparkml_spark.operators.llm import _minhash_sig_long

    docs = load_table(spark, sf_dir, "documents")
    tok_sets = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    ).localCheckpoint()
    sig_long = _minhash_sig_long(tok_sets)
    left = sig_long.select(F.col("doc_id").alias("doc_a"), "band", "bk")
    right = sig_long.select(F.col("doc_id").alias("doc_b"), "band", "bk")
    cand = (
        left.join(right, ["band", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = tok_sets.select("doc_id", F.size("toks").alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    pruned = (
        cand.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(
            F.least("na", "nb") * 10000 >= F.greatest("na", "nb") * 9499
        )
    )
    a = tok_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
    ).hint("shuffle_hash")
    b_ = tok_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    ).hint("shuffle_hash")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        pruned.join(a, "doc_a")
        .join(b_, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                1.0 - inter / (F.col("na") + F.col("nb") - inter), 4
            ).alias("jaccard_dist"),
        )
        .filter(F.col("jaccard_dist") <= 0.05)
        .select("doc_a", "doc_b", "jaccard_dist")
    )


OLD = {
    "graph_triangles": old_graph_triangles,
    "agg_count_min_topk": old_agg_count_min_topk,
    "llm_minhash_lsh_dedup": old_llm_minhash_lsh_dedup,
}


def timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ops = sys.argv[1:] or list(OLD)
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("ab-r17")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for op in ops:
        new_fn, _ = registry.get(op)
        old_fn = OLD[op]
        # result equality (sorted rows), once per op
        a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
        assert a == b, f"{op}: old/new results differ ({len(a)} vs {len(b)})"
        print(f"{op}: results identical ({len(a)} rows)", flush=True)
        olds, news = [], []
        for i in range(ROUNDS):
            spark.sparkContext.setJobDescription(f"{op} old r{i}")
            olds.append(timed(old_fn, spark))
            spark.sparkContext.setJobDescription(f"{op} new r{i}")
            news.append(timed(new_fn, spark))
            print(
                f"  round {i}: old {olds[-1]:.3f}s new {news[-1]:.3f}s",
                flush=True,
            )
        out[op] = {
            "old": [round(x, 3) for x in olds],
            "new": [round(x, 3) for x in news],
            "old_min": round(min(olds), 3),
            "new_min": round(min(news), 3),
            "old_median": round(sorted(olds)[len(olds) // 2], 3),
            "new_median": round(sorted(news)[len(news) // 2], 3),
            "rows": len(a),
        }
        print(
            f"{op}: old min {out[op]['old_min']} median "
            f"{out[op]['old_median']} | new min {out[op]['new_min']} "
            f"median {out[op]['new_median']}",
            flush=True,
        )
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
