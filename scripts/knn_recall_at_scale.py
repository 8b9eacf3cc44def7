#!/usr/bin/env python
"""Recall witness for `llm_knn_join`'s 17+-bit adaptive band regime
(VERDICT r12 #2): the r12 cap raise (16 -> 20 bits) was hash-verified
but recall was only ever asserted up to the 5-bit regime (sf0.1,
N=2000). This script builds a 4.5M-vector clustered corpus — the
smallest N at which `_adaptive_band_bits` actually emits 17
(N >= 2^22) — and measures recall@5 for a deterministic sample of
queries against the exact brute-force ground truth.

Honesty notes:
 - The approximate side runs THE OPERATOR'S code path
   (`llm._knn_join_topk`, the same function `llm_knn_join` calls)
   with its query-restriction parameter; a unit test at sf0.1 pins
   that the restricted result equals the full operator output
   filtered to the sampled qids (per-query top-5 depends only on
   that query's bucket-mates, which are identical either way).
 - The corpus is CLUSTERED (90k clusters x 50 members, coordinate
   perturbation ~1e-2 against unit-range coordinates), because
   recall on uniformly-random vectors is information-free: with no
   genuine neighbor structure, LSH at high bit-width correctly
   refuses to collide (that regime is covered at sf0.1 where the
   near-random corpus measures 0.75 at 5 bits). Real embedding
   corpora cluster; this fixture models that while keeping every
   value deterministic (integer LCG mixes, no RNG state).
 - Exact ground truth: the sampled query vectors are broadcast as a
   numpy int64 matrix and each corpus partition emits its local
   top-5 per query (exact integer quantized distances, identical
   quantization to the operator's `_quantize_vec`); a global window
   reduces local winners to the true top-5 — one corpus scan, no
   all-pairs materialization.

Usage: python scripts/knn_recall_at_scale.py [out.json]
Writes KNN_RECALL_r13.json at the repo root and exits nonzero if
recall < 0.6 (the VERDICT's gate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# N is env-overridable (VERDICT r13 #4: witness the 18-20-bit
# regimes too). Defaults reproduce the r13 17-bit artifact; the
# 20-bit cap regime needs N >= 2^25 = 33,554,432
# (KNN_N=33554432 KNN_DIR=/tmp/infofarmsparkml_knn20). QUERY_MOD
# scales with N so the sample stays ~200 queries.
N = int(os.environ.get("KNN_N", 4_500_000))
D = os.environ.get("KNN_DIR", "/tmp/infofarmsparkml_knn17")
MEMBERS = 50          # vectors per cluster
DIMS = 64
# ~200 sampled queries: vec_id % QUERY_MOD == 0. Floored at 1 so a
# small KNN_N override degrades to querying every vector instead of
# a modulo-by-zero crash (ADVICE r14); below ~1000 vectors the
# recall sample is too small to mean much, so warn.
QUERY_MOD = max(1, N // 200)
if N < 1000:
    print(f"# warning: KNN_N={N} is tiny; recall sample is degenerate")
K = 5
MIN_BITS = int(os.environ.get("KNN_MIN_BITS", 17))


def build_fixture(spark) -> None:
    """90k clusters x 50 members of 64-dim float vectors: member =
    center(cluster) + per-member perturbation. Integer LCG mixes
    keep every coordinate deterministic and partition-invariant."""
    import numpy as np

    out = f"{D}/embeddings.parquet"
    if os.path.exists(out):
        # A killed prior run can leave a partial part-file set, and
        # edited N/MEMBERS/DIMS silently change what the artifact
        # measures — validate the reuse instead of trusting the path.
        try:
            n = spark.read.parquet(out).count()
        except Exception:
            n = -1
        if n == N:
            return
        print(f"# stale fixture at {out} (rows={n}, want {N}): rebuilding")
        import shutil

        shutil.rmtree(D, ignore_errors=True)
    os.makedirs(D, exist_ok=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype="int64")
            c = ids // MEMBERS
            j = np.arange(DIMS, dtype="int64")
            # center coordinate in [-1, 1): LCG mix of (cluster, dim)
            mix_c = (c[:, None] * 73856093 + j[None, :] * 19349663) % 2000001
            center = mix_c.astype("float64") / 1e6 - 1.0
            # member perturbation in [-0.01, 0.01]: mix of (id, dim)
            mix_e = (ids[:, None] * 2654435761 + j[None, :] * 40503) % 21
            eps = (mix_e.astype("float64") - 10.0) * 1e-3
            vec = (center + eps).astype("float32")
            import pandas as pd

            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vec)}
            )

    df = spark.range(N).repartition(64)
    emb = df.mapInPandas(gen, "vec_id long, embedding array<float>")
    emb.write.mode("overwrite").parquet(out)


def exact_topk(spark, quant, qids_rows) -> set:
    """True top-K (qid, nid) pairs for the sampled queries: one
    corpus scan emitting per-partition local top-K per query (numpy
    int64, the operator's exact quantized distance), then a global
    top-K window over the tiny local-winner set."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    qm = np.asarray([r["qv"] for r in qids_rows], dtype="int64")
    qid_arr = np.asarray([r["vec_id"] for r in qids_rows], dtype="int64")
    bq = spark.sparkContext.broadcast((qid_arr, qm))

    def local_topk(batches):
        import pandas as pd

        qids, qmat = bq.value  # (Q,), (Q, 64)
        qn = (qmat * qmat).sum(axis=1)  # (Q,)
        for pdf in batches:
            nids = pdf["vec_id"].to_numpy(dtype="int64")
            m = np.asarray(pdf["qv"].tolist(), dtype="int64")  # (B, 64)
            if len(m) == 0:
                continue
            # exact int64 squared distances via the expansion
            # |m|^2 - 2 m.q + |q|^2 — a (B, Q) matrix, never the
            # (Q, B, 64) difference tensor (which OOM-killed the
            # first run of this script at 32 workers x 1 GB/batch).
            # Magnitudes: |m.q| <= 64 * (1.2e6)^2 ~ 9.2e13 — exact
            # in int64 with room to spare.
            mn = (m * m).sum(axis=1)  # (B,)
            d = mn[:, None] - 2 * (m @ qmat.T) + qn[None, :]  # (B, Q)
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                row = d[:, qi]
                mask = nids != qids[qi]
                cand_n, cand_d = nids[mask], row[mask]
                take = min(K, len(cand_n))
                if take == 0:
                    continue
                # exact top-K by (qdist, nid): partition to the
                # K-th distance, then lexsort only the <=threshold
                # subset so distance ties still break by nid
                kth = np.partition(cand_d, take - 1)[take - 1]
                sub = cand_d <= kth
                sn, sd = cand_n[sub], cand_d[sub]
                idx = np.lexsort((sn, sd))[:take]
                out_q.extend([qids[qi]] * take)
                out_n.extend(sn[idx])
                out_d.extend(sd[idx])
            yield pd.DataFrame(
                {"qid": out_q, "nid": out_n, "qdist": out_d}
            )

    local = quant.mapInPandas(
        local_topk, "qid long, nid long, qdist long"
    )
    w = W.partitionBy("qid").orderBy("qdist", "nid")
    top = (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    )
    return {(r["qid"], r["nid"]) for r in top}


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "KNN_RECALL_r13.json",
        )
    )
    from pyspark.sql import functions as F

    from infofarmsparkml_spark.operators.llm import (
        _adaptive_band_bits,
        _double_vecs,
        _knn_join_topk,
        _quantize_vec,
    )
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("knn-recall-17bit")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    build_fixture(spark)
    build_sec = round(time.time() - t0, 2)

    n = spark.read.parquet(f"{D}/embeddings.parquet").count()
    bits = _adaptive_band_bits(n)
    assert bits >= MIN_BITS, (
        f"N={n} only reaches {bits} bits; grow the fixture"
    )

    emb = _double_vecs(spark, D, "vec_id", "e")
    quant = emb.select(
        "vec_id", _quantize_vec("e").alias("qv")
    ).localCheckpoint()

    qids_rows = quant.filter(F.col("vec_id") % QUERY_MOD == 0).collect()

    t1 = time.time()
    approx_df = _knn_join_topk(
        quant, n, query_pred=F.col("vec_id") % QUERY_MOD == 0
    )
    approx = {(r["qid"], r["nid"]) for r in approx_df.collect()}
    approx_sec = round(time.time() - t1, 2)

    t2 = time.time()
    exact = exact_topk(spark, quant, qids_rows)
    exact_sec = round(time.time() - t2, 2)

    recall = round(len(approx & exact) / max(len(exact), 1), 4)
    result = {
        "n_vectors": n,
        "band_bits": bits,
        "n_bands": 16,
        "n_queries": len(qids_rows),
        "k": K,
        "recall_at_5": recall,
        "exact_pairs": len(exact),
        "approx_pairs_for_queries": len(approx),
        "fixture_build_sec": build_sec,
        "approx_sec": approx_sec,
        "exact_sec": exact_sec,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "note": f"clustered {N // MEMBERS} x {MEMBERS} fixture "
        "(deterministic LCG), approx side = llm._knn_join_topk (the "
        "operator's own core) restricted to the sampled queries; "
        "restricted==full pinned by test at sf0.1. Gate: recall >= "
        "0.6 (VERDICT r12 #2 / r13 #4).",
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    print(json.dumps(result))
    return 0 if recall >= 0.6 else 1


if __name__ == "__main__":
    raise SystemExit(main())
