#!/usr/bin/env python
"""100x-posture empirical smoke (VERDICT r5 #6c): run the priciest
operators at an sf1-EQUIVALENT scale — 10x the sf0.1 fixture — and
record wall-clock scaling ratios, validating the AQE/skew/iteration
claims empirically rather than by plan shape alone.

The driver's generator only ships sf<=0.1, so the sf1 input is
synthesized deterministically from sf0.1: each table is the union
of 10 copies with every key column shifted by copy_index * (max_key
+ 1) — producing 10 disjoint, internally-consistent shards, so a
well-scaling operator should cost ~10x (near-linear), never ~100x.
Document texts get a per-copy suffix on EVERY token so the
replication does not plant 10-way exact or near duplicates that the
real distribution lacks.

Writes SCALE_SMOKE_r{N}.json at the repo root:
  {op: {"sf0.1_sec": a, "sf1_sec": b, "ratio": b/a}}

Usage: python scripts/scale_smoke.py [round_number]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/infofarmsparkml_sf1"
COPIES = 10

# the sweep's priciest Spark-side operators (PARITY_r5/r6 top) —
# banded LSH, segment-explode timeseries, iterative graph ops.
# ORDER MATTERS for measurement fidelity: the LSH ops run FIRST —
# measured after the iterative graph ops, llm_knn_join's sf0.1
# leg read 35-44 s in a heap-stressed JVM vs ~10 s fresh (its own
# sf1 leg, running second, even came out FASTER than sf0.1 —
# impossible for real compute). Graph ops go last; agg_groupby is
# the tiny linearity control and is insensitive to position.
OPS = [
    "llm_minhash_lsh_dedup",
    "llm_knn_join",
    # round-9 additions (VERDICT r8 #7): the last unsmoked heavy
    # ops — SRP-cluster diversity sampling, embedding near-dup,
    # and the multi-stage curation pipeline run with the LSH
    # cohort up front (same JVM-freshness sensitivity)
    "llm_semantic_dedup",
    "llm_diversity_sample",
    "llm_curation_pipeline",
    "ts_gap_fill_locf",
    "ts_interpolate_linear",
    "graph_pagerank",
    "graph_triangles",
    "graph_kcore",
    # round-6 additions: retrieval, star-contraction CC, and the
    # runtime-bloom join — the newest registered plans, smoked so
    # their scale posture is validated empirically, not just by
    # plan shape
    "llm_bm25_topk",
    "llm_dup_substring",
    "graph_cc_star",
    "graph_label_propagation",
    "join_runtime_bloom",
    # round-10 additions (VERDICT r9 #6): the DOULION sparsified
    # triangle estimate — smoked against exact graph_triangles to
    # evidence the p^2 path-volume reduction at 10x data — and the
    # md5-threshold sample (pure scan filter; the trivial-linearity
    # control alongside agg_groupby)
    "graph_triangles_doulion",
    "sample_hash_deterministic",
    # round-11 addition (VERDICT r10 #7): the fixpoint k-core twin —
    # smoked against bounded graph_kcore; peel depth grows with
    # diameter, not size, so the ratio should track the bounded
    # twin's (it runs in the graph cohort at the tail)
    "graph_kcore_exact",
    "agg_groupby",  # flagship baseline for the linearity comparison
]

# context attached to an op's row in the JSON — for measurements
# whose raw ratio needs interpretation
OP_NOTES = {
    # 10 disjoint copies -> exactly 10x the length-2 path count
    # (the Schank-Wagner algorithmic floor). Isolated fresh-JVM
    # reruns of the sf1 leg span 100-142 s (ratio 10-14x): the
    # spread is single-JVM GC variance on a ~490M-row path stream,
    # not a plan defect — probing initialPartitionNum=256 (AQE
    # start-wide) made it WORSE (176 s: 256 shuffle-hash build
    # tables dominate), and a 48 GB heap changed nothing. Cost is
    # linear in paths; on a real cluster the stream is spread over
    # executors instead of one heap.
    "graph_triangles": (
        "ratio is linear in the 10x path count; fresh-JVM reruns "
        "span 10-14x (single-JVM GC variance, not plan shape — "
        "wider AQE initial partitions and a 2x heap both probed, "
        "neither helps)"
    ),
}

# key columns to shift per copy, per table (disjoint shards that
# keep every FK relationship internally consistent)
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "nation": [],  # tiny dims replicate as-is (copy 0 only)
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _decorrelate_embedding(F):
    """Clone-free per-copy embedding perturbation (VERDICT r13 #2).

    The r6 'tiny rotation' (±0.015/component vs component std
    ~0.123) left every copy at cosine ~0.997 to its siblings — for
    SRP-LSH all N copies of a vector share band signatures at ANY
    bit width (identical projection signs), so every clone group
    collapsed into one bucket and candidate-pair volume grew with
    the SQUARE of the copy factor: the sf10 smoke measured clone
    mass, not the algorithm. Real disjoint shards are directionally
    INDEPENDENT, so: shrink the shared component (x0.5) and add
    hash noise at ~2.3x the residual signal scale (uniform
    [-0.25, 0.25], std 0.144) — cross-copy cosine drops to ~0.15
    (projection signs ~independent), copies land in independent
    buckets, and true near-dup pair count stays linear in the copy
    factor. Deterministic and partition-invariant: the noise keys on
    vec_id (already copy-shifted) and the component index — no RNG.

    The noise generator must be a REAL hash (Murmur3 via F.hash),
    not a linear congruential mix: the first cut of this fix used
    `(vec_id*A + j*B) % 501`, which across components j is an
    arithmetic progression mod 501 — only 501 distinct noise
    vectors exist (cyclic shifts of one sawtooth), so vectors
    sharing a residue class got IDENTICAL noise and, with the
    signal shrunk 2x, became near-parallel phantom clones
    (~400-member classes at sf10). PAIRMASS_r14's first run caught
    it: kNN candidate volume grew 40-48x/decade with max bucket
    occupancy 9066. Murmur3's avalanche has no such lattice."""
    return F.transform(
        "embedding",
        lambda x, j: (
            x * 0.5
            + (
                F.pmod(F.hash(F.col("vec_id"), j), F.lit(501))
                .cast("double")
                / 1000.0
                - 0.25
            ).cast("float")
        ).cast("float"),
    )


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for table, keys in KEYS.items():
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        if not keys:
            df.write.mode("overwrite").parquet(out)
            continue
        maxes = df.agg(
            *[F.max(k).alias(k) for k in keys]
        ).collect()[0]
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + i * (int(maxes[k]) + 1))
            if table == "documents":
                # vary texts per copy — PER TOKEN, not one appended
                # token: shingle/minhash similarity barely notices a
                # single extra token, so the r6 smoke's first run
                # measured every copy as a near-dup of the original
                # (10-way planted clusters -> a 20.9x minhash ratio
                # that was pure fixture artifact). Suffixing every
                # token keeps within-copy similarity structure
                # intact (a bijective token map) while making
                # cross-copy shingle sets disjoint, like real
                # disjoint shards.
                c = c.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"$1c{i}"),
                )
            if table == "embeddings":
                c = c.withColumn("embedding", _decorrelate_embedding(F))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"# built {table}", file=sys.stderr)


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    from infofarmsparkml_spark import registry
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="infofarmsparkml-scale-smoke")
    build_fixture(spark)
    results: dict[str, dict] = {}
    import gc

    for name in OPS:
        fn, _ = registry.get(name)
        row: dict = {}
        for label, sf_dir in [("sf0.1_sec", SRC), ("sf1_sec", DST)]:
            # drop prior ops' localCheckpoint RDDs before timing —
            # the same hygiene driver_sim applies: without it the
            # JVM carries GBs of checkpointed graph/LSH state into
            # later measurements (first r6 run: llm_knn_join sf0.1
            # read 35.6 s under that pressure vs 6.7 s isolated)
            gc.collect()
            t0 = time.time()
            # noop sink: full execution, zero write cost (save()
            # returns None — timing only, no row count here)
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.time() - t0, 2)
        row["ratio"] = round(row["sf1_sec"] / max(row["sf0.1_sec"], 1e-9), 2)
        if name in OP_NOTES:
            row["note"] = OP_NOTES[name]
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    out = {
        "copies": COPIES,
        "note": "sf1 = 10 disjoint key-shifted copies of sf0.1; "
        "near-linear ratio (~10x or less) validates the scale "
        "posture empirically",
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "ops": results,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, f"SCALE_SMOKE_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
