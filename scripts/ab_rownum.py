#!/usr/bin/env python
"""Interleaved A/B of the r16 global_row_number rewrite (checkpoint +
monotonic-id ranks) vs the sealed shape (_pid window + re-derived
offsets branch), on the sort_multi query — same protocol as
scripts/ab_q21_q9.py.

Usage: python scripts/ab_rownum.py [sf_dir] [samples_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F  # noqa: E402

from infofarmsparkml_spark.operators._util import load_table  # noqa: E402


def grn_old(df: DataFrame, order_cols, out_col: str, n_parts: int = 32) -> DataFrame:
    local = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols)),
        )
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_lrn")).cast("int"))
        .drop("_pid", "_lrn", "_offset")
    )


def sort_multi_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    key = [
        F.col("status_or_null").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ]
    return grn_old(t, key, "sort_pos").select(
        "o_orderkey", "status_or_null", "o_totalprice", "sort_pos"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from infofarmsparkml_spark.operators.sorts import sort_multi
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="ab-rownum")
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "sortmulti_old": lambda: sort_multi_old(spark, sf_dir),
        "sortmulti_new": lambda: sort_multi(spark, sf_dir),
    }
    a = sorted(map(tuple, arms["sortmulti_old"]().collect()))
    b = sorted(map(tuple, arms["sortmulti_new"]().collect()))
    assert a == b, "sort_multi: OLD != NEW results"
    print(f"# sort_multi: results identical ({len(a)} rows)", file=sys.stderr)

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
