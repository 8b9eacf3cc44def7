"""F3 math + F4 cast/null functions (SURVEY.md §2.8).

Cross-engine notes: DuckDB CAST(double AS INT) ROUNDS while Spark
truncates — the oracle uses TRUNC() to match; DuckDB floor/ceil
return DOUBLE (cast to BIGINT to match Spark's LONG); transcendental
functions (exp/ln/log10/pow) may differ in the last ulp between
libm implementations, so they are rounded to 8 decimals on both
sides; sqrt is IEEE-correctly-rounded and stays raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import load_table, r
from infofarmsparkml_spark.registry import query


@query(
    "fn_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  abs(l_extendedprice - 50000.0) AS dist_50k,
  sqrt(l_extendedprice) AS price_sqrt,
  ROUND(pow(l_discount, 2), 8) AS disc_sq,
  ROUND(exp(l_discount), 8) AS disc_exp,
  ROUND(ln(l_extendedprice), 8) AS price_ln,
  ROUND(log10(l_extendedprice), 8) AS price_log10,
  CAST(sign(l_extendedprice - 50000.0) AS INTEGER) AS above_50k,
  greatest(l_quantity, l_discount * 100) AS g,
  least(l_quantity, l_tax * 100) AS l,
  ((l_partkey - 2 * l_suppkey) % 7 + 7) % 7 AS pm7,
  l_partkey % 7 AS m7
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math pack — rounding family, transcendentals, sign,
    variadic min/max, positive modulo."""
    lf = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 50000.0).alias("dist_50k"),
        F.sqrt(price).alias("price_sqrt"),
        r(F.pow(F.col("l_discount"), 2), 8).alias("disc_sq"),
        r(F.exp("l_discount"), 8).alias("disc_exp"),
        r(F.log(price), 8).alias("price_ln"),
        r(F.log10(price), 8).alias("price_log10"),
        F.signum(price - 50000.0).cast("int").alias("above_50k"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("l"),
        F.pmod(F.col("l_partkey") - 2 * F.col("l_suppkey"), F.lit(7)).alias("pm7"),
        (F.col("l_partkey") % 7).alias("m7"),
    )


@query(
    "fn_cast_null",
    oracle="""
SELECT
  c_custkey,
  CAST(c_custkey AS VARCHAR) AS ckey_str,
  CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_trunc,
  TRY_CAST(substring(c_name, 10, 9) AS BIGINT) AS cust_num,
  TRY_CAST(c_mktsegment AS BIGINT) AS bad_cast,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
  c_acctbal > 0 AS is_positive,
  CAST(c_nationkey AS DOUBLE) AS nation_dbl
FROM customer
""",
)
def fn_cast_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: cast matrix + null combinators. Spark double→long cast
    truncates toward zero (TRUNC in the oracle — DuckDB's CAST
    rounds); try_cast yields NULL on failure in both."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("ckey_str"),
        F.col("c_acctbal").cast("long").alias("bal_trunc"),
        F.substring("c_name", 10, 9).try_cast("long").alias("cust_num"),
        F.col("c_mktsegment").try_cast("long").alias("bad_cast"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        (F.col("c_acctbal") > 0).alias("is_positive"),
        F.col("c_nationkey").cast("double").alias("nation_dbl"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT
  o_orderkey,
  o_orderkey & 255 AS and_mask,
  o_orderkey | 4096 AS or_flag,
  xor(o_orderkey, o_custkey) AS xor_keys,
  (o_orderkey % 16) << 2 AS shl,
  o_orderkey >> 3 AS shr,
  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
  ~o_orderkey AS flipped
FROM orders
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: bitwise pack — and/or/xor/shifts/popcount/not. These are
    the building blocks of the hash/fingerprint operators (SimHash
    bands, bloom partitioning). DuckDB's ``^`` is exponentiation,
    so the oracle spells XOR as ``xor()``."""
    od = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return od.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).alias("or_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("xor_keys"),
        F.shiftleft(k % 16, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("flipped"),
    )


@query(
    "fn_trig",
    oracle="""
SELECT c_custkey,
       round(sin(c_acctbal / 1000.0), 9)            AS sin_v,
       round(cos(c_acctbal / 1000.0), 9)            AS cos_v,
       round(atan2(c_acctbal, 1000.0), 9)           AS atan2_v,
       round(degrees(atan(c_acctbal / 1000.0)), 9)  AS deg_v,
       round(exp(-abs(c_acctbal) / 10000.0), 9)     AS decay_v
FROM customer
""",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3b: trigonometric/transcendental pack. Arguments are scaled
    into small ranges (|x| ≲ 10) and results rounded to 9 decimals
    on both sides: Java's StrictMath and DuckDB's libm may disagree
    in the last ulp (~1e-16 here), and full-precision repr would
    surface that; 9 decimals is far above the ulp and far below any
    analytical use's tolerance."""
    cu = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal") / 1000.0
    return cu.select(
        "c_custkey",
        F.round(F.sin(x), 9).alias("sin_v"),
        F.round(F.cos(x), 9).alias("cos_v"),
        F.round(F.atan2(F.col("c_acctbal"), F.lit(1000.0)), 9).alias("atan2_v"),
        F.round(F.degrees(F.atan(x)), 9).alias("deg_v"),
        F.round(F.exp(-F.abs(F.col("c_acctbal")) / 10000.0), 9).alias("decay_v"),
    )
