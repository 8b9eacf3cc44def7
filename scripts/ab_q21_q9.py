#!/usr/bin/env python
"""Interleaved A/B of the r16 tpch_q21 / tpch_q9 plan changes vs the
sealed (pre-39a5231) shapes, in ONE session, alternating arms every
round (guide §1: interleave to control for host drift; this sandbox
shows bursty multi-second stalls, so report ALL samples + min +
median — min is the noise-robust statistic for CPU-bound work on a
bursty host).

The OLD arms are the sealed implementations reconstructed exactly:
q21_old = current tail, but groupBy directly on the unprojected scan
(two fact exchanges); q9_old = supplier and nation as two separate
broadcast probes.

Usage: python scripts/ab_q21_q9.py [sf_dir] [samples_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: E402

from infofarmsparkml_spark.operators._util import (  # noqa: E402
    load_table,
    money,
    net_price_exact,
    sum_money,
)


def _q21_tail(spark: SparkSession, sf_dir: str, x: DataFrame) -> DataFrame:
    """Shared tail, byte-identical to operators/tpch.py tpch_q21."""
    w = Window.partitionBy("l_orderkey")
    flagged = (
        x.withColumn("omax", F.max("smax").over(w))
        .withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "nlate",
            F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("smax") == F.col("omax"))
            & (F.col("nsupp") >= 2)
            & (F.col("nlate") == 1)
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        flagged.join(orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q21_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    return _q21_tail(spark, sf_dir, x)


def q9_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    lf = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey"), F.col("n_name").alias("nation")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (
        money("p_retailprice")
        * money("l_quantity")
        * F.lit("0.01").cast("decimal(12,4)")
    ).cast("decimal(18,6)")
    profit = (net_price_exact().cast("decimal(18,6)") - cost).cast("decimal(18,6)")
    return (
        lf.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(sum_money(profit, "profit"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from infofarmsparkml_spark.operators.tpch import tpch_q21, tpch_q9
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="ab-q21-q9")
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "q21_old": lambda: q21_old(spark, sf_dir),
        "q21_new": lambda: tpch_q21(spark, sf_dir),
        "q9_old": lambda: q9_old(spark, sf_dir),
        "q9_new": lambda: tpch_q9(spark, sf_dir),
    }
    # result-equality check first (sorted rows)
    for base in ("q21", "q9"):
        a = sorted(map(tuple, arms[f"{base}_old"]().collect()))
        b = sorted(map(tuple, arms[f"{base}_new"]().collect()))
        assert a == b, f"{base}: OLD != NEW results"
        print(f"# {base}: results identical ({len(a)} rows)", file=sys.stderr)

    samples: dict[str, list[float]] = {k: [] for k in arms}
    for k, fn in arms.items():  # warmup each arm once
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(n):
        for k, fn in arms.items():  # interleaved: every round hits all arms
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
