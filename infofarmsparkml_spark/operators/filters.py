"""Projections / filters / predicates (SURVEY.md §2.2, P1-P6).

Everything here is a narrow projection over a pushed-down filter —
Catalyst folds these into the parquet scan (PushedFilters +
ReadSchema), so the physical plan reads only the referenced columns.
Raw column passthrough is exact (no rounding needed); only computed
doubles are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import load_table, net_price
from infofarmsparkml_spark.registry import query


@query(
    "project_arith",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS net_price,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  l_quantity * 2 AS double_qty,
  l_extendedprice / 100 AS price_pct
FROM lineitem
""",
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: arithmetic projection. Deliberately UNROUNDED: both
    engines evaluate the same IEEE-754 expression tree per row, so
    raw doubles are bit-identical — whereas ROUND itself diverges
    between engines on exact decimal halves, which this synthetic
    data hits systematically (few-decimal-digit money values)."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        net_price().alias("net_price"),
        (net_price() * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2).alias("double_qty"),
        (F.col("l_extendedprice") / 100).alias("price_pct"),
    )


@query(
    "filter_conj",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity > 30
  AND (l_discount < 0.03 OR l_returnflag IN ('A', 'R'))
  AND NOT l_linestatus = 'F'
""",
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: conjunction/disjunction/negation — all pushed to the scan."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.filter(
        (F.col("l_quantity") > 30)
        & ((F.col("l_discount") < 0.03) | F.col("l_returnflag").isin("A", "R"))
        & ~(F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_null",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  NULLIF(l_discount, 0.0) AS disc_or_null,
  NULLIF(l_discount, 0.0) IS NULL AS is_free,
  NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)
    AS disc_eq_tax_nullsafe,
  COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled
FROM lineitem
WHERE NULLIF(l_discount, 0.0) IS NOT NULL OR l_tax = 0.0
""",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: NULL semantics — fixtures have no nulls, so NULLIF
    manufactures them; exercises isNull / eqNullSafe / coalesce."""
    lf = load_table(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax_null = F.nullif(F.col("l_tax"), F.lit(0.0))
    return (
        lf.select(
            "l_orderkey",
            "l_linenumber",
            disc_null.alias("disc_or_null"),
            disc_null.isNull().alias("is_free"),
            disc_null.eqNullSafe(tax_null).alias("disc_eq_tax_nullsafe"),
            F.coalesce(disc_null, F.lit(-1.0)).alias("disc_filled"),
        )
        .filter(F.col("disc_or_null").isNotNull() | (F.col("l_tax") == 0.0))
        .drop("l_tax")
    )


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%widget%'
  AND regexp_matches(p_type, '^(ECONOMY|PROMO|SMALL)')
  AND starts_with(p_brand, 'Brand#1')
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: pattern predicates — LIKE, regex (partial-match in both
    engines), prefix match."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%widget%")
        & F.col("p_type").rlike("^(ECONOMY|PROMO|SMALL)")
        & F.col("p_brand").startswith("Brand#1")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "filter_between_in",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 200000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: BETWEEN (inclusive both ends) + IN-list."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "case_when",
    oracle="""
SELECT
  o_orderkey,
  CASE WHEN o_totalprice > 300000 THEN 'large'
       WHEN o_totalprice > 150000 THEN 'medium'
       ELSE 'small' END AS size_band,
  CASE o_orderstatus WHEN 'O' THEN 'open'
                     WHEN 'F' THEN 'final'
                     ELSE 'other' END AS status_label
FROM orders
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: searched + simple CASE projection."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 150000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "final")
        .otherwise("other")
        .alias("status_label"),
    )
