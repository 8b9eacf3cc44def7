#!/usr/bin/env python
"""Interleaved A/B of the r16 single-exchange densify rewrites
(ts_gap_fill_locf / ts_interpolate_linear) vs their sealed
two-exchange shapes — same protocol as scripts/ab_q21_q9.py.

Usage: python scripts/ab_densify.py [sf_dir] [samples_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F  # noqa: E402

from infofarmsparkml_spark.operators._util import cents, load_table  # noqa: E402


def _locf_tail(seg: DataFrame) -> DataFrame:
    hh = F.explode(
        F.sequence(
            F.col("h"),
            F.coalesce(F.col("nh") - F.expr("interval 1 hour"), F.col("h")),
            F.expr("interval 1 hour"),
        )
    )
    pts = seg.select("user_id", "h", "v", hh.alias("hh"))
    return pts.select(
        "user_id",
        F.col("hh").alias("hour"),
        (F.col("hh") == F.col("h")).alias("observed"),
        F.col("v").alias("v_filled"),
    )


def locf_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = W.partitionBy("user_id").orderBy("h")
    seg = hourly.select("user_id", "h", "v", F.lead("h").over(w).alias("nh"))
    return _locf_tail(seg)


def _interp_tail(seg: DataFrame) -> DataFrame:
    hh = F.explode(
        F.sequence(
            F.col("h"),
            F.coalesce(F.col("nh") - F.expr("interval 1 hour"), F.col("h")),
            F.expr("interval 1 hour"),
        )
    )
    pts = seg.select("user_id", "h", "vc", "nh", "nvc", hh.alias("hh"))
    hours = lambda a, b: (  # noqa: E731
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600)
    ).cast("long")
    frac = hours("h", F.col("hh")).cast("double") / hours("h", F.col("nh"))
    v_cents = F.col("vc") + (F.col("nvc") - F.col("vc")) * frac
    observed = F.col("hh") == F.col("h")
    v_interp = F.when(
        observed, F.col("vc").cast("double") / F.lit(100.0)
    ).otherwise(
        F.floor(v_cents * F.lit(100.0) + F.lit(0.5)).cast("double")
        / F.lit(10000.0)
    )
    return pts.select(
        "user_id",
        F.col("hh").alias("hour"),
        observed.alias("observed"),
        v_interp.alias("v_interp"),
    )


def interp_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(cents("value")).alias("vc"))
    w = W.partitionBy("user_id").orderBy("h")
    seg = hourly.select(
        "user_id", "h", "vc",
        F.lead("h").over(w).alias("nh"),
        F.lead("vc").over(w).alias("nvc"),
    )
    return _interp_tail(seg)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from infofarmsparkml_spark.operators.timeseries import (
        ts_gap_fill_locf,
        ts_interpolate_linear,
    )
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark(app_name="ab-densify")
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "locf_old": lambda: locf_old(spark, sf_dir),
        "locf_new": lambda: ts_gap_fill_locf(spark, sf_dir),
        "interp_old": lambda: interp_old(spark, sf_dir),
        "interp_new": lambda: ts_interpolate_linear(spark, sf_dir),
    }
    for base in ("locf", "interp"):
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
