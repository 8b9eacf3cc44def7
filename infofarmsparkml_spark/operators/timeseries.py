"""Time-series operators over the events table (SURVEY.md §2
extensions): dense gap-fill with last-observation-carried-forward,
and OHLC resampling — the hypertable-rollup shapes a metrics /
market-data pipeline runs continuously.

Scale posture: both operators shuffle once on the series key
(user_id). The gap-fill spine is generated per key from that key's
own [min, max] hour range (`sequence` + `explode`), so spine size is
bounded by each series' span — never a global calendar cross join.
LOCF is `last(ignorenulls)` over one running frame — a single window
on a single user_id exchange, no self-join (the DuckDB oracle uses
the portable fill-group formulation). OHLC is a single hash aggregate
with min_by/max_by over a zero-padded (ts, event_id) string key, so
first/last are deterministic under ties and identical to the
DuckDB oracle's arg_min/arg_max on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


@query(
    "ts_gap_fill_locf",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds),
joined AS (
  SELECT s.user_id, s.h, hv.v,
         COUNT(hv.v) OVER (PARTITION BY s.user_id ORDER BY s.h) AS grp
  FROM spine s LEFT JOIN hourly hv ON s.user_id = hv.user_id AND s.h = hv.h)
SELECT user_id, h AS hour, (v IS NOT NULL) AS observed,
       MAX(v) OVER (PARTITION BY user_id, grp) AS v_filled
FROM joined
""",
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's hourly value series over its own
    [first, last] hour and fill silent hours by carrying the last
    observed value forward. Spark side: ``last(v, ignorenulls)``
    over one running frame — ONE exchange on user_id serves spine
    join and fill. DuckDB lacks ignore-nulls there, so the oracle
    uses the equivalent fill-group trick (a running count of
    observed rows is constant across a run of missing hours, so
    MAX per (user, count) group is the carried value)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    run = W.partitionBy("user_id").orderBy("h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour"),
        F.col("v").isNotNull().alias("observed"),
        F.last("v", ignorenulls=True).over(run).alias("v_filled"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
       ROUND(arg_min(value, printf('%020d-%020d',
             epoch_us(CAST(ts AS TIMESTAMP)), event_id)), 4) AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       ROUND(arg_max(value, printf('%020d-%020d',
             epoch_us(CAST(ts AS TIMESTAMP)), event_id)), 4) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's value stream to hourly
    open/high/low/close bars. One partial-aggregable hash aggregate:
    min_by/max_by carry (value, key) pairs through map-side combine,
    so no window sort and no per-group row materialization — the
    shape that survives a billion-row series. The order key is a
    zero-padded (µs, event_id) string so first/last are total-ordered
    and tie-stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d-%020d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.round(F.min_by("value", key), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", key), 4).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
WITH z AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         AVG(value) OVER w AS mu,
         COUNT(*) OVER w AS n,
         stddev_pop(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, ts, value,
       ROUND((value - mu) / sd, 3) AS zscore
FROM z WHERE n >= 5 AND sd > 1e-9 AND ABS((value - mu) / sd) > 2
""",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    the mean/σ of its user's trailing 11-event window; emit events
    beyond 2σ (with a 5-event warm-up and a degenerate-σ guard).
    One window over one user_id exchange — the streaming-friendly
    rolling-statistics shape, identical frames on both engines so
    population σ and the flagged set hash-match exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, 0)
    z = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.stddev_pop("value").over(w).alias("sd"),
    )
    score = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        z.filter(
            (F.col("n") >= 5) & (F.col("sd") > 1e-9) & (F.abs(score) > 2)
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.round(score, 3).alias("zscore"),
        )
    )
