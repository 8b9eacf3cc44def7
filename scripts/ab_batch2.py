#!/usr/bin/env python
"""Interleaved A/B of the r16 batch-2 rewrites vs their sealed
shapes (ts_outlier_mad, agg_count_min_topk, agg_hll_distinct_portable)
in ONE session, alternating arms per round — same protocol as
scripts/ab_q21_q9.py. OLD arms are the pre-rewrite implementations
reproduced verbatim; result equality is asserted before timing.

Usage: python scripts/ab_batch2.py [sf_dir] [samples_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from infofarmsparkml_spark.operators._util import load_table  # noqa: E402
from infofarmsparkml_spark.operators.aggregates import (  # noqa: E402
    _HLL_M_ORD,
    _HLL_M_PART,
    _HLL_NUM_ORD,
    _HLL_NUM_PART,
    _HLL_TAG_ORD,
    _HLL_TAG_PART,
)


def mad_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    med = v.groupBy("user_id").agg(
        F.percentile(F.col("vc"), F.lit(0.5)).alias("med")
    )
    dev = v.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("vc") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("vc") - F.col("med")) > 5 * F.col("mad"))
        )
        .select("user_id", "event_id", "vc", "med", "mad")
    )


def cm_old(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    cand = li.distinct().select("k", r_col).withColumn("col", col)
    est = (
        cand.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(truth, "k")
        .select(
            F.col("k").alias("part"),
            "cm_estimate",
            "true_count",
            (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("cm_estimate"), "part")
        .limit(10)
    )


def hll_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    lf = load_table(spark, sf_dir, "lineitem")

    def est(col: str, m: int, num: float, tag: str, out: str) -> DataFrame:
        h = F.md5(F.concat(F.col(col).cast("string"), F.lit(tag)))
        reg = (
            lf.select(
                "l_returnflag",
                (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m)
                .alias("j"),
                F.conv(F.substring(h, 5, 12), 16, 10).cast("long").alias("w"),
            )
            .groupBy("l_returnflag", "j")
            .agg(
                F.max(
                    F.when(F.col("w") == 0, F.lit(49)).otherwise(
                        F.lit(49) - F.length(F.bin("w"))
                    )
                ).alias("mj")
            )
        )
        s = reg.groupBy("l_returnflag").agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - mj)")).alias(
                "s_part"
            ),
            F.count(F.lit(1)).alias("n_reg"),
        )
        scaled = F.col("s_part") + (
            (F.lit(m).cast("long") - F.col("n_reg")) * F.lit(2**49)
        )
        return s.select(
            "l_returnflag",
            F.round(F.lit(num) / scaled.cast("double"), 2).alias(out),
        )

    est_o = est("l_orderkey", _HLL_M_ORD, _HLL_NUM_ORD, _HLL_TAG_ORD,
                "hll_orders")
    est_p = est("l_partkey", _HLL_M_PART, _HLL_NUM_PART, _HLL_TAG_PART,
                "hll_parts")
    truth = lf.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("true_orders"),
        F.countDistinct("l_partkey").alias("true_parts"),
    )
    return (
        truth.join(est_o, "l_returnflag")
        .join(est_p, "l_returnflag")
        .select(
            "l_returnflag",
            "hll_orders", "true_orders",
            "hll_parts", "true_parts",
            F.when(
                (F.col("hll_orders") > 2.5 * _HLL_M_ORD)
                & (F.col("hll_parts") > 2.5 * _HLL_M_PART),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("int").alias("raw_regime"),
        )
        .orderBy("l_returnflag")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from infofarmsparkml_spark.operators.aggregates import (
        agg_count_min_topk,
        agg_hll_distinct_portable,
    )
    from infofarmsparkml_spark.operators.timeseries import ts_outlier_mad
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="ab-batch2")
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "mad_old": lambda: mad_old(spark, sf_dir),
        "mad_new": lambda: ts_outlier_mad(spark, sf_dir),
        "cm_old": lambda: cm_old(spark, sf_dir),
        "cm_new": lambda: agg_count_min_topk(spark, sf_dir),
        "hll_old": lambda: hll_old(spark, sf_dir),
        "hll_new": lambda: agg_hll_distinct_portable(spark, sf_dir),
    }
    for base in ("mad", "cm", "hll"):
        a = sorted(map(tuple, arms[f"{base}_old"]().collect()))
        b = sorted(map(tuple, arms[f"{base}_new"]().collect()))
        assert a == b, f"{base}: OLD != NEW results"
        print(f"# {base}: results identical ({len(a)} rows)", file=sys.stderr)

    samples: dict[str, list[float]] = {k: [] for k in arms}
    for k, fn in arms.items():
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(n):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(round(time.perf_counter() - t0, 3))
    out = {
        k: {"samples": v, "min": min(v), "median": round(statistics.median(v), 3)}
        for k, v in samples.items()
    }
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
