"""Sorts / limits / sampling (SURVEY.md §2.6, O1-O3).

The driver hash is order-insensitive, so sort order itself is made
checkable by materializing a rank column. Global ORDER BY in Spark
is a range-partitioned sort (sampled boundaries) — scales fine; the
single-partition window in O1 exists only to stamp verification
positions and is flagged as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


@query(
    "sort_multi",
    oracle="""
WITH t AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null, o_totalprice
  FROM orders
)
SELECT o_orderkey, status_or_null, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY status_or_null ASC NULLS LAST,
                          o_totalprice DESC, o_orderkey) AS sort_pos
FROM t
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with explicit NULLS LAST (nulls
    manufactured via NULLIF). sort_pos makes the ordering
    hash-checkable; the unpartitioned window is verification-only
    — production global sorts use orderBy (range partitioned)."""
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    w = W.orderBy(
        F.col("status_or_null").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return t.withColumn("sort_pos", F.row_number().over(w))


@query(
    "limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k → TakeOrderedAndProject (per-partition
    top-k then k-way merge on the driver; never a full sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query("sample_tablesample")  # seed semantics differ per engine: rows-only
def sample_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: Bernoulli sample, fixed seed — deterministic for a given
    Spark version/partitioning but not reproducible in DuckDB."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
