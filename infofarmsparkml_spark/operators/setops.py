"""Set operations (SURVEY.md §2.7, U1-U5).

UNION ALL is a zero-shuffle concat; the DISTINCT variants shuffle on
the full row — at scale prefer pre-aggregated keys or semi-joins
when only membership is needed. dropDuplicates with a subset has a
nondeterministic survivor under distribution, so the deterministic
window-pick variant is what we register for the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


@query(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL with overlapping inputs (duplicates kept).
    Second branch feeds unionByName with reordered columns to
    exercise by-name resolution."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_orderpriority"
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderpriority", "o_orderkey"  # reordered on purpose
    )
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000
UNION
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION (dedup) — concat + distinct shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_orderpriority"
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
INTERSECT
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 0
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: INTERSECT (set semantics)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_nationkey"
    )
    b = cust.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_nationkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 0
EXCEPT
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4a: EXCEPT (set semantics)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_nationkey"
    )
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
EXCEPT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4b: EXCEPT ALL (bag semantics — multiplicity preserved)."""
    lf = load_table(spark, sf_dir, "lineitem")
    a = lf.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    b = lf.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    oracle="""
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3b: INTERSECT ALL (bag semantics)."""
    lf = load_table(spark, sf_dir, "lineitem")
    a = lf.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    b = lf.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    return a.intersectAll(b)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5a: DISTINCT over projected columns."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.select("l_returnflag", "l_linestatus").distinct()


@query(
    "dropdup_deterministic",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity) AS rn
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_quantity FROM ranked WHERE rn = 1
""",
)
def dropdup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5b: subset dedup with a DETERMINISTIC survivor (min
    (linenumber, quantity) per order — linenumber alone is NOT
    unique in this data). `dropDuplicates(["l_orderkey"])` keeps
    an arbitrary row per key under distribution — fine for
    idempotent pipelines, wrong for a value-hash gate — so the
    registered form is the window pick."""
    lf = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
    return (
        lf.select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
