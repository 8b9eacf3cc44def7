#!/usr/bin/env python
"""PQ-family scale smoke (r16, VERDICT r15 #3): cold fresh-JVM runs
of `llm_pq_topk` and `llm_ivf_pq_topk` at corpus sizes far beyond
the sf fixtures, with MEASURED (not analytical) probe fractions.

For each N a deterministic clustered fixture (the same integer-LCG
construction as scripts/knn_recall_at_scale.py — 50-member clusters,
64 dims, no RNG state) is written once to /tmp, then each operator
runs in its OWN subprocess JVM (cold: includes session start, the
codebook TakeOrderedAndProject, UDF worker spin-up — the honest
end-to-end number a first query pays).

Measured per run:
  - wall_sec (cold, end-to-end to .collect());
  - for llm_ivf_pq_topk: per-query candidate counts from the
    operator's own cell assignment (recomputed with the operator's
    `_pq_picks` + `_pq_sub_d2` helpers and the same coarse argmin —
    cited: operators/llm.py::llm_ivf_pq_topk), giving PER-QUERY
    AVERAGES over the 5 queries:
      candidate_fraction = total_candidates / (5 * N)  (rows/query)
      probed_byte_fraction = (total_candidates/5)*24B / (N*256B)
        (bytes touched per query: [cell,id,codes] int64 triple vs
         64 float32 raw)
  - for llm_pq_topk: the flat ADC scan reads every CODE row once:
      candidate_fraction = 1.0, byte fraction = 8B/256B = 1/32,
    plus |q| x 200 exact-rerank point lookups.

Writes PQ_SMOKE_r{N}.json at the repo root:
  {"runs": [{op, n, wall_sec, candidate_fraction, ...}],
   "linear": {op: wall ratios vs N ratios}}

Usage: python scripts/pq_smoke.py [round=16] [Ns=100000,400000,1600000]
Child mode (internal): pq_smoke.py --child <op> <n> <dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIMS = 64
MEMBERS = 50


def fixture_dir(n: int) -> str:
    return f"/tmp/infofarmsparkml_pq_{n}"


def build_fixture(spark, n: int) -> None:
    """Same deterministic clustered corpus as the kNN harness."""
    import numpy as np

    d = fixture_dir(n)
    out = f"{d}/embeddings.parquet"
    if os.path.exists(out):
        try:
            have = spark.read.parquet(out).count()
        except Exception:
            have = -1
        if have == n:
            return
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype="int64")
            c = ids // MEMBERS
            j = np.arange(DIMS, dtype="int64")
            mix_c = (c[:, None] * 73856093 + j[None, :] * 19349663) % 2000001
            center = mix_c.astype("float64") / 1e6 - 1.0
            mix_e = (ids[:, None] * 2654435761 + j[None, :] * 40503) % 21
            eps = (mix_e.astype("float64") - 10.0) * 1e-3
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list((center + eps).astype("float32")),
                }
            )

    spark.range(n).repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(out)


def child(op: str, n: int, d: str) -> None:
    """Cold run in a fresh JVM; prints one JSON line."""
    from infofarmsparkml_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(f"pq-smoke-{op}-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    from infofarmsparkml_spark import registry

    fn, _ = registry.get(op)
    rows = fn(spark, d).collect()
    wall = time.time() - t0
    rec = {
        "op": op,
        "n": n,
        "wall_sec": round(wall, 2),
        "result_rows": len(rows),
    }
    if op == "llm_ivf_pq_topk":
        # measure what the operator actually probes: its own cell
        # assignment (operator helpers, same md5 picks, same coarse
        # argmin with ties -> smaller cell) -> per-query candidate
        # counts over the 5 probed cells
        import numpy as np
        from pyspark.sql import functions as F

        from infofarmsparkml_spark.operators.llm import (
            _double_vecs,
            _pq_picks,
            _quantize_vec,
        )

        quant = _double_vecs(spark, d, "vec_id", "e").select(
            "vec_id", _quantize_vec("e").alias("qv")
        )
        G = np.asarray(_pq_picks(quant), dtype="int64")[:16]
        gn = (G * G).sum(axis=1)
        bG = spark.sparkContext.broadcast((G, gn))

        def assign(batches):
            import pandas as pd

            Gb, gnb = bG.value
            for pdf in batches:
                m = np.asarray(pdf["qv"].tolist(), dtype="int64")
                if len(m) == 0:
                    continue
                cd = (
                    (m * m).sum(axis=1)[:, None]
                    - 2 * (m @ Gb.T)
                    + gnb[None, :]
                )
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cell": cd.argmin(axis=1).astype("int32"),
                    }
                )

        cells = quant.mapInPandas(assign, "vec_id long, cell int")
        hist = {
            r["cell"]: r["cnt"]
            for r in cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        qv = np.asarray(
            [
                r["qv"]
                for r in quant.filter(F.col("vec_id") < 5)
                .orderBy("vec_id")
                .collect()
            ],
            dtype="int64",
        )
        cd = (qv * qv).sum(axis=1)[:, None] - 2 * (qv @ G.T) + gn[None, :]
        probes = np.argsort(cd, axis=1, kind="stable")[:, :5]
        cand = [int(sum(hist.get(int(c), 0) for c in row)) for row in probes]
        total_cand = sum(cand)
        rec.update(
            {
                "candidates_per_query": cand,
                "candidate_fraction": round(total_cand / (5 * n), 4),
                "probed_byte_fraction": round(
                    (total_cand / 5 * 24) / (n * DIMS * 4), 4
                ),
                "cell_sizes": sorted(hist.values()),
            }
        )
    elif op == "llm_pq_topk":
        rec.update(
            {
                "candidate_fraction": 1.0,
                "probed_byte_fraction": round(8 / (DIMS * 4), 4),
                "rerank_lookups": 5 * 200,
            }
        )
    print("PQ_SMOKE_CHILD " + json.dumps(rec))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return 0
    rnd = sys.argv[1] if len(sys.argv) > 1 else "16"
    ns = [
        int(x)
        for x in (
            sys.argv[2] if len(sys.argv) > 2 else "100000,400000,1600000"
        ).split(",")
    ]
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("pq-smoke-fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        t = time.time()
        build_fixture(spark, n)
        print(f"# fixture N={n} ready in {time.time()-t:.0f}s")
    spark.stop()

    runs = []
    for n in ns:
        for op in ("llm_pq_topk", "llm_ivf_pq_topk"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", op,
                 str(n), fixture_dir(n)],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = [
                ln
                for ln in p.stdout.splitlines()
                if ln.startswith("PQ_SMOKE_CHILD ")
            ]
            if p.returncode != 0 or not line:
                print(p.stdout[-2000:])
                print(p.stderr[-2000:])
                raise RuntimeError(f"child failed: {op} N={n}")
            rec = json.loads(line[0][len("PQ_SMOKE_CHILD "):])
            runs.append(rec)
            print(f"# {op} N={n}: {rec['wall_sec']}s "
                  f"frac={rec.get('candidate_fraction')}")

    linear = {}
    for op in ("llm_pq_topk", "llm_ivf_pq_topk"):
        ws = [r["wall_sec"] for r in runs if r["op"] == op]
        linear[op] = {
            "n_ratio": [round(b / a, 2) for a, b in zip(ns, ns[1:])],
            "wall_ratio": [round(b / a, 2) for a, b in zip(ws, ws[1:])],
        }
    art = {
        "round": rnd,
        "ns": ns,
        "loadavg_1m_start": round(os.getloadavg()[0], 2),
        "runs": runs,
        "linear": linear,
        "note": (
            "cold fresh-JVM per run (includes session start + codebook "
            "pick + Arrow worker spin-up); clustered LCG fixture, "
            "50-member clusters"
        ),
    }
    out = os.path.join(REPO, f"PQ_SMOKE_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"# wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
