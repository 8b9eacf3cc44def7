"""TPC-H-shaped composite queries over the trimmed fixture schema.

These exercise multi-join + aggregation pipelines end-to-end the way
analysts actually combine the §2 operators. Shapes are adapted to
the trimmed columns (no shippriority/shipmode/comment); Q1 is the
flagship `agg_groupby`. Join strategy: dims broadcast, fact-fact
sort-merge, aggregation-before-join where the shape allows (Q18
pre-aggregates lineitem before touching orders — at 100 TB that's
the difference between shuffling 6 B rows and 150 M groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import (
    load_table,
    money,
    net_price_exact,
    r,
    sum_money,
    ts_lit,
)
from infofarmsparkml_spark.registry import query


@query(
    "tpch_q3",
    oracle="""
SELECT l_orderkey, o_orderdate,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape (shipping priority): segment filter pushed into the
    customer scan; customer joins broadcast; lineitem never
    shuffles before the final group-by."""
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts_lit("1998-01-01")
    )
    lf = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts_lit("1998-01-01")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lf, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum_money(net_price_exact(), "revenue"))
    )


@query(
    "tpch_q5",
    oracle="""
SELECT n_name, CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape (supplier volume by nation within a region; the
    customer-nation = supplier-nation clause is dropped — the
    synthetic keys never align, making it trivially empty)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    )
    lf = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        orders.join(lf, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            sum_money(net_price_exact(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q6",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecast revenue change): pure scan-filter-aggregate —
    every predicate reaches the parquet reader."""
    lf = load_table(spark, sf_dir, "lineitem")
    return (
        lf.filter(
            (F.col("l_shipdate") >= ts_lit("1996-01-01"))
            & (F.col("l_shipdate") < ts_lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum_money(money("l_extendedprice") * money("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape (returned-item reporting by customer)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-04-01"))
    )
    lf = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lf, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_money(net_price_exact(), "revenue"))
    )


@query(
    "tpch_q18",
    oracle="""
WITH big AS (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume customers): lineitem pre-aggregates
    to order granularity BEFORE joining — the aggregation-pushdown
    pattern that cuts the join input by the average order width.
    l_quantity is integer-valued so the HAVING threshold is exact."""
    lf = load_table(spark, sf_dir, "lineitem")
    big = (
        lf.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 200)
        .select("l_orderkey", r(F.col("raw_qty")).alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@query(
    "tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order-priority checking). The commit/receipt-date
    clause is adapted to the trimmed schema as `l_shipdate >
    o_orderdate` — same EXISTS-decorrelation shape: left-semi join
    on orderkey with the extra non-equi predicate, then count by
    priority. Lineitem is the probe side and never materializes
    beyond the semi-join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-04-01"))
    )
    lf = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lf,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q14",
    oracle="""
SELECT CAST(CAST(
         100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l_discount AS DECIMAL(12,4)))
                   ELSE CAST(0 AS DECIMAL(12,4)) END)
       AS VARCHAR) AS DOUBLE) AS promo_revenue,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promotion effect): date-filtered lineitem joins a
    broadcast part dim; conditional decimal aggregate. The usual
    promo/total ratio is surfaced as two exact sums instead of one
    division so the oracle hash-match stays float-robust."""
    lf = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-01-01"))
        & (F.col("l_shipdate") < ts_lit("1996-02-01"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    promo = F.when(
        F.col("p_type").like("PROMO%"), net_price_exact()
    ).otherwise(F.lit(0).cast("decimal(12,4)"))
    return lf.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        sum_money((F.lit(100.0).cast("decimal(12,4)") * promo).cast("decimal(20,4)"), "promo_revenue"),
        sum_money(net_price_exact(), "total_revenue"),
    )


@query(
    "tpch_q19",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
       AND l_quantity BETWEEN 20 AND 40)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted revenue, disjunctive predicates): the
    brand/size arms prune the broadcast part side before the join;
    the mixed part×lineitem disjunction evaluates post-join inside
    whole-stage codegen — no fallback to nested-loop."""
    lf = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (
                (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
            )
            | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 45))
        )
    )
    arm = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 45)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        lf.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm)
        .agg(
            sum_money(net_price_exact(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
