"""F2 date/time functions (SURVEY.md §2.8).

Cross-engine notes baked into the oracle: DuckDB's date_trunc and
last_day return DATE (cast to TIMESTAMP to match Spark); dayofweek
numbering differs (we use ISO: DuckDB isodow == Spark weekday()+1);
Spark date_add/add_months return DATE (cast to TIMESTAMP on the
Spark side). months_between / next_day are Spark-specific semantics
with no DuckDB twin — covered by unit tests, not the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


@query(
    "fn_date",
    oracle="""
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(day(o_orderdate) AS INTEGER) AS dy,
  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
  CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 7 DAY AS plus_week,
  o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
    AS days_since_epoch_start,
  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
  CAST(date_diff('second', TIMESTAMP '1970-01-01', o_orderdate) AS BIGINT)
    AS epoch_s,
  strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date pack — extraction, truncation, arithmetic, diffs,
    epoch conversion, formatting."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        (F.weekday(d) + 1).alias("dow_iso"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d, 7).cast("timestamp").alias("plus_week"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "fn_date_spark",
    oracle="""
SELECT o_orderkey,
       ROUND((2000 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
             + (1 - day(o_orderdate)) / 31.0, 8) AS months_to_y2k,
       CAST(CAST(o_orderdate AS DATE)
            + INTERVAL (8 - isodow(o_orderdate)) DAY AS TIMESTAMP)
         AS next_monday,
       CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year_start
FROM orders
""",
)
def fn_date_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2b: months_between (fractional, 31-day convention) and
    next_day — Spark-defined semantics; unit-tested on literals.

    The oracle inlines Spark's documented rules, which collapse to
    closed form for this anchor: months_between(2000-01-01, d) =
    Δmonths + (1 - day(d))/31 rounded to 8 digits (the anchor's
    day-of-month is 1, so the same-day special case equals the
    general formula, and fixture timestamps are all midnight → no
    time fraction); next_day(d,'Mon') = d + (8 - isodow(d)) days.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.months_between(F.lit("2000-01-01").cast("timestamp"), d).alias(
            "months_to_y2k"
        ),
        F.next_day(d, "Mon").cast("timestamp").alias("next_monday"),
        F.trunc(d, "year").cast("timestamp").alias("year_start"),
    )
