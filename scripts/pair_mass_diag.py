#!/usr/bin/env python
"""Pair-mass linearity diagnostic for the two-decade smoke fixture
(VERDICT r13 #2): the r13 smoke attributed kNN/minhash second-decade
ratios of ~21x/16x to "fixture-quadratic TRUE near-dup pair mass".
This script measures that mass directly — with the operators' OWN
bucket constructions, never a reimplementation — so the attribution
is a number, not an annotation:

  - minhash: bucket-join candidate volume Σ_buckets C(occ, 2) over
    `llm._minhash_sig_long` (the op's signature half) plus the
    verified-output pair count (= true near-dup pairs, the op's
    actual result), split into within-copy vs CROSS-copy pairs.
  - kNN: SRP candidate volume Σ_buckets C(occ, 2) over
    `llm._srp_band_keys` at the op's own `_adaptive_band_bits`
    width, same within/cross-copy split.

A clone-free fixture must show cross-copy mass ~0 and total mass
~linear in the copy factor (x10 per decade). Writes
PAIRMASS_r{N}.json at the repo root.

Usage: python scripts/pair_mass_diag.py [round_number]
(fixtures must already exist — run scripts/scale_smoke2.py's
builders first)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_smoke import DST as D1  # noqa: E402
from scale_smoke import SRC, KEYS, _decorrelate_embedding  # noqa: E402
from scale_smoke2 import D10  # noqa: E402

SCALES = [("sf0.1", SRC), ("sf1", D1), ("sf10", D10)]

# Third decade (VERDICT r14 #5): candidate volume only, documents +
# embeddings only — 1000 key-shifted copies of sf0.1 (5M docs / 2M
# vectors). The full dedup output run is skipped at this scale (the
# verified-pair mass is fixture hygiene, settled at sf1/sf10 with
# cross-copy == 0); what decade 3 adjudicates is whether the
# CANDIDATE volume ratios converge to ~10/decade.
D100 = "/tmp/infofarmsparkml_sf100_pm"
COPIES100 = 1000


def build_fixture100(spark) -> None:
    """documents + embeddings at 1000 copies, same bijective-token /
    decorrelated-embedding construction as scale_smoke2's sf10
    builder (crossJoin against range(N) keeps the plan flat)."""
    from pyspark.sql import functions as F

    os.makedirs(D100, exist_ok=True)
    for table in ("documents", "embeddings"):
        out = f"{D100}/{table}.parquet"
        if os.path.exists(out):
            continue
        keys = KEYS[table]
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        copies = spark.range(COPIES100).select(F.col("id").alias("_ci"))
        c = df.crossJoin(copies)
        for k in keys:
            c = c.withColumn(k, F.col(k) + F.col("_ci") * (int(maxes[k]) + 1))
        if table == "documents":
            c = c.withColumn(
                "text",
                F.regexp_replace(
                    "text",
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1c"), F.col("_ci").cast("string")),
                ),
            )
        else:
            c = c.withColumn("embedding", _decorrelate_embedding(F))
        c.drop("_ci").write.mode("overwrite").parquet(out)
        print(f"# built {table} x{COPIES100}", file=sys.stderr)


def bucket_pair_volume(keys, group_cols):
    """Σ over buckets of C(occupancy, 2) — the exact row count the
    bucket self-join produces before any dedup/prune."""
    from pyspark.sql import functions as F

    occ = keys.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    row = occ.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        F.max("n").alias("max_occ"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    return int(row["pairs"] or 0), int(row["max_occ"] or 0), int(
        row["n_buckets"]
    )


def copy_split(pairs_df, a_col, b_col, shift):
    """(within_copy, cross_copy) counts: copy index = id // shift
    (shift = base-table max key + 1, the key-shift stride)."""
    from pyspark.sql import functions as F

    if shift is None:  # base fixture: single copy by definition
        n = pairs_df.count()
        return n, 0
    same = (F.col(a_col) / shift).cast("long") == (
        F.col(b_col) / shift
    ).cast("long")
    row = pairs_df.agg(
        F.sum(F.when(same, 1).otherwise(0)).alias("within"),
        F.sum(F.when(same, 0).otherwise(1)).alias("cross"),
    ).collect()[0]
    return int(row["within"] or 0), int(row["cross"] or 0)


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    from pyspark.sql import functions as F

    from infofarmsparkml_spark.operators import llm
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="pair-mass-diag")
    spark.sparkContext.setLogLevel("ERROR")

    # key-shift strides, from the BASE fixture (same arithmetic as
    # the builders: copy k shifts ids by k * (max_key + 1))
    doc_shift = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )
    vec_shift = (
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .collect()[0][0]
        + 1
    )

    build_fixture100(spark)

    out: dict[str, dict] = {}
    for label, sf_dir, full in [s + (True,) for s in SCALES] + [
        ("sf100", D100, False)
    ]:
        shift_d = None if label == "sf0.1" else doc_shift
        shift_v = None if label == "sf0.1" else vec_shift
        row: dict = {}

        docs = llm.load_table(spark, sf_dir, "documents")
        tok_sets = docs.select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        ).localCheckpoint()
        sig_long = llm._minhash_sig_long(tok_sets)
        candv, max_occ, n_buckets = bucket_pair_volume(
            sig_long, ["band", "bk"]
        )
        row["minhash"] = {
            "n_docs": docs.count(),
            "cand_join_volume": candv,
            "max_bucket_occ": max_occ,
            "n_buckets": n_buckets,
        }
        if full:
            from infofarmsparkml_spark import registry

            fn, _ = registry.get("llm_minhash_lsh_dedup")
            out_pairs = fn(spark, sf_dir).localCheckpoint()
            w, c = copy_split(out_pairs, "doc_a", "doc_b", shift_d)
            row["minhash"]["out_pairs_within_copy"] = w
            row["minhash"]["out_pairs_cross_copy"] = c

        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        emb = llm._double_vecs(spark, sf_dir, "vec_id", "e")
        quant = emb.select(
            "vec_id", llm._quantize_vec("e").alias("qv")
        ).localCheckpoint()
        bits = llm._adaptive_band_bits(n)
        keys = llm._srp_band_keys(quant, n_bands=16, band_bits=bits)
        kcandv, kmax_occ, kn_buckets = bucket_pair_volume(
            keys, ["band", "bkey"]
        )
        row["knn"] = {
            "n_vecs": n,
            "band_bits": bits,
            "cand_join_volume": kcandv,
            "max_bucket_occ": kmax_occ,
            "n_buckets": kn_buckets,
        }
        if full:
            # cross/within split of the CANDIDATE volume (not just
            # output): count bucket-mate pairs by copy relation on a
            # per-bucket basis via a self-join restricted to one band
            # (volume per band is i.i.d. across bands; band 0 is an
            # unbiased 1/16 sample measured exactly)
            k0 = keys.filter(F.col("band") == 0)
            a = k0.select(F.col("vec_id").alias("va"), "bkey")
            b = k0.select(F.col("vec_id").alias("vb"), "bkey")
            p0 = a.join(b, "bkey").filter(F.col("va") < F.col("vb"))
            kw, kc = copy_split(p0, "va", "vb", shift_v)
            row["knn"]["band0_pairs_within_copy"] = kw
            row["knn"]["band0_pairs_cross_copy"] = kc
        out[label] = row
        print(f"# {label}: {json.dumps(row)}", file=sys.stderr)

    def ratio(metric_path):
        def get(label):
            d = out[label]
            for k in metric_path:
                d = d[k]
            return d

        return {
            "d1": round(get("sf1") / max(get("sf0.1"), 1), 2),
            "d2": round(get("sf10") / max(get("sf1"), 1), 2),
            "d3": round(get("sf100") / max(get("sf10"), 1), 2),
            # the honest linearity statement for an occupancy-
            # stepped schedule: the CUMULATIVE ratio vs the 1000x
            # data factor (per-decade ratios oscillate with where N
            # lands in the integer bits ladder — see note)
            "cum_3dec": round(get("sf100") / max(get("sf0.1"), 1), 1),
        }

    result = {
        "note": "candidate volume measured with the operators' own "
        "bucket constructions (llm._minhash_sig_long / "
        "llm._srp_band_keys); linear fixture => cross-copy mass ~0 "
        "and CUMULATIVE candidate-volume ratio ~= the data factor. "
        "Copy index = id // (base max key + 1). sf100 = 1000 copies, "
        "documents+embeddings only, candidate volume only (output "
        "pair runs settled at sf1/sf10).",
        "why_per_decade_ratios_oscillate": "kNN band width is "
        "_adaptive_band_bits(n) = n.bit_length() - 6 (clamped "
        "[4,20]): bits move in INTEGER steps, so expected bucket "
        "occupancy n/2^bits cycles through [32, 64) as n grows — a "
        "single decade's candidate ratio (~ 10 x occ_after/"
        "occ_before) can land anywhere in [5, 20] by where n falls "
        "in the cycle, while the product over decades stays linear. "
        "r14's d1=7.35/d2=14.77 multiply to 108.6 for 100x data; "
        "decade 3 closes the question by measuring the cumulative "
        "ratio at 1000x (VERDICT r14 #5).",
        "doc_copy_shift": doc_shift,
        "vec_copy_shift": vec_shift,
        "scales": out,
        "ratios": {
            "minhash_cand_volume": ratio(["minhash", "cand_join_volume"]),
            "knn_cand_volume": ratio(["knn", "cand_join_volume"]),
        },
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, f"PAIRMASS_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
