"""Aggregations (SURVEY.md §2.4, A1-A11).

All hash aggregations: Spark plans partial (map-side) + final
aggregation automatically, so these shuffle only the per-group
partial states — the right shape at 100 TB. Double-typed aggregates
are rounded on BOTH the Spark and oracle side because float
summation order is engine- and partitioning-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from infofarmsparkml_spark.operators._util import (
    load_table,
    money,
    net_cents,
    net_price_exact,
    r,
    cents,
    sum_cents,
    sum_money,
    ts_lit,
)
from infofarmsparkml_spark.registry import query


@query(
    "agg_hash_global",
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  CAST(COUNT(l_orderkey) AS BIGINT) AS n_orderkeys,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  MIN(l_shipdate) AS min_ship,
  MAX(l_shipdate) AS max_ship,
  ROUND(MIN(l_discount), 2) AS min_disc,
  ROUND(MAX(l_tax), 2) AS max_tax
FROM lineitem
""",
)
def agg_hash_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global aggregates — single-row result, no group keys."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_orderkey").alias("n_orderkeys"),
        r(F.sum("l_quantity")).alias("sum_qty"),
        r(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        r(F.min("l_discount")).alias("min_disc"),
        r(F.max("l_tax")).alias("max_tax"),
    )


@query(
    "agg_groupby",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
    AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(12,4)))
                AS DECIMAL(12,4))
           * (1 + CAST(l_tax AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
    AS sum_charge,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  ROUND(AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (flagship): TPC-H Q1-shape pricing summary.

    Scan → pushed-down filter → 8 aggregates over 2 group keys.
    6 groups total, so the final shuffle is tiny regardless of
    input scale — all the work is map-side partial aggregation.
    """
    lf = load_table(spark, sf_dir, "lineitem")
    charge_c6 = net_cents() * (100 + cents("l_tax"))
    return (
        lf.filter(F.col("l_shipdate") <= ts_lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r(F.sum("l_quantity")).alias("sum_qty"),
            r(F.sum("l_extendedprice")).alias("sum_base_price"),
            sum_cents(net_cents(), "sum_disc_price"),
            sum_cents(charge_c6, "sum_charge", 6),
            r(F.avg("l_quantity"), 4).alias("avg_qty"),
            r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
SELECT
  l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
  ROUND(SUM(DISTINCT l_quantity), 2) AS sum_distinct_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: distinct aggregates (expand + two-phase agg in Spark)."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        r(F.sum_distinct(F.col("l_quantity"))).alias("sum_distinct_qty"),
    )


@query(
    "agg_histogram",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS bucket_total
FROM orders GROUP BY bucket
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by arithmetic bucketing — the
    one-shuffle distributed histogram (bucket id computed map-side
    from the value, partial counts combine before the exchange).
    Double division + FLOOR is IEEE-identical in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / F.lit(50000.0))
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r(F.sum("o_totalprice")).alias("bucket_total"),
        )
    )


@query("agg_approx_distinct")  # approx sketch — can never hash-match: rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: HyperLogLog++ approximate count-distinct. Deterministic
    for fixed input but not SQL-equal to exact COUNT(DISTINCT);
    tolerance asserted in tests/test_operators.py."""
    lf = load_table(spark, sf_dir, "lineitem")
    # rsd 0.02, not 0.01: HLL++ flips to its high-precision update
    # path below ~2% rsd and costs 5x the wall time (3.6 s vs 0.7 s
    # at sf0.1) for accuracy the 5%-tolerance contract never needs.
    return lf.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )


# Portable-HLL geometry (A4's SQL-oracled twin, same graduation move
# as the count-min sketch below): registers come from md5 bits so
# DuckDB builds the bit-identical sketch. m sized so the RAW HLL
# estimator applies at every fixture SF (no small-range linear-
# counting branch — that needs ln(), whose last-ulp behavior is
# libm-dependent and would break the hash gate; the `raw_regime`
# output column pins the contract instead). Registers are 48-bit
# windows (md5 hex chars 5-16); the harmonic-mean sum stays exact
# int64 as sum of 2^(49-M_j), max 256 * 2^49 = 2^57; the ONLY float
# op on either engine is the final single division by the same
# Python-generated numerator literal, then ROUND(_, 2) — the same
# cross-engine float contract every rounded aggregate here uses.
_HLL_M_ORD = 256  # rsd 1.04/sqrt(256) = 6.5%; 2.5m=640 < 1081 orders@sf0.001
_HLL_M_PART = 64  # rsd 13%; 2.5m=160 < 200 parts@sf0.001
_HLL_NUM_ORD = (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * float(2**49)
_HLL_NUM_PART = 0.709 * 64 * 64 * float(2**49)  # alpha_64 (HLL paper)
_HLL_TAG_ORD, _HLL_TAG_PART = "_hllord", "_hllpart"


def _hll_sketch_sql(col: str, m: int, num: float, tag: str) -> str:
    """DuckDB CTE body computing the portable-HLL estimate of
    COUNT(DISTINCT col) per l_returnflag — generated from the SAME
    Python constants as the Spark side so the two can't drift."""
    return f"""
  SELECT l_returnflag,
         ROUND({num!r} / CAST(s_part + ({m} - n_reg)
                              * (CAST(1 AS BIGINT) << 49) AS DOUBLE),
               2) AS est
  FROM (
    SELECT l_returnflag,
           CAST(SUM(CAST(1 AS BIGINT) << (49 - mj)) AS BIGINT) AS s_part,
           COUNT(*) AS n_reg
    FROM (
      SELECT l_returnflag, j,
             MAX(CASE WHEN w = 0 THEN 49
                      ELSE 49 - length(bin(w)) END) AS mj
      FROM (
        SELECT l_returnflag,
               CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)
                                           || '{tag}'), 1, 4))
                    AS BIGINT) % {m} AS j,
               CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)
                                           || '{tag}'), 5, 12))
                    AS BIGINT) AS w
        FROM lineitem) h
      GROUP BY 1, 2) reg
    GROUP BY 1) s
"""


@query(
    "agg_hll_distinct_portable",
    oracle=f"""
WITH est_o AS ({_hll_sketch_sql("l_orderkey", _HLL_M_ORD, _HLL_NUM_ORD, _HLL_TAG_ORD)}),
est_p AS ({_hll_sketch_sql("l_partkey", _HLL_M_PART, _HLL_NUM_PART, _HLL_TAG_PART)}),
truth AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS true_orders,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS true_parts
  FROM lineitem GROUP BY 1)
SELECT t.l_returnflag,
       o.est AS hll_orders, t.true_orders,
       p.est AS hll_parts, t.true_parts,
       CAST(CASE WHEN o.est > {2.5 * _HLL_M_ORD!r}
                  AND p.est > {2.5 * _HLL_M_PART!r}
            THEN 1 ELSE 0 END AS INT) AS raw_regime
FROM truth t
JOIN est_o o ON o.l_returnflag = t.l_returnflag
JOIN est_p p ON p.l_returnflag = t.l_returnflag
ORDER BY t.l_returnflag
""",
)
def agg_hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 twin: HyperLogLog distinct-count you OWN — md5-derived
    registers so the sketch is engine-portable (mergeable across
    days/streams by register-wise MAX, re-checkable bit-identically
    in any engine with md5 — the property the native HLL++ sketch
    in `agg_approx_distinct` can't offer), joined against exact
    counts so the error is visible in the result. Raw-regime
    estimator only (see the geometry note above); `raw_regime` = 1
    is the domain contract, pinned at every fixture SF by
    tests/test_operators.py plus a tolerance check vs truth.

    Scale: the register build is one hash aggregate keyed
    (group, j) — fully map-side combinable, so 100 TB collapses to
    ≤ m rows per group per partition before the exchange; the
    harmonic sum then aggregates ≤ groups×m rows. The exact-truth
    join is the display twin (itself two partial-aggregable
    passes), not part of the sketch path."""
    lf = load_table(spark, sf_dir, "lineitem")

    def est(col: str, m: int, num: float, tag: str, out: str) -> DataFrame:
        h = F.md5(F.concat(F.col(col).cast("string"), F.lit(tag)))
        reg = (
            lf.select(
                "l_returnflag",
                (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m)
                .alias("j"),
                F.conv(F.substring(h, 5, 12), 16, 10).cast("long")
                .alias("w"),
            )
            .groupBy("l_returnflag", "j")
            .agg(
                F.max(
                    F.when(F.col("w") == 0, F.lit(49)).otherwise(
                        F.lit(49) - F.length(F.bin("w"))
                    )
                ).alias("mj")
            )
        )
        s = reg.groupBy("l_returnflag").agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), 49 - mj)")
            ).alias("s_part"),
            F.count(F.lit(1)).alias("n_reg"),
        )
        scaled = F.col("s_part") + (
            (F.lit(m).cast("long") - F.col("n_reg")) * F.lit(2**49)
        )
        return s.select(
            "l_returnflag",
            F.round(F.lit(num) / scaled.cast("double"), 2).alias(out),
        )

    est_o = est("l_orderkey", _HLL_M_ORD, _HLL_NUM_ORD, _HLL_TAG_ORD,
                "hll_orders")
    est_p = est("l_partkey", _HLL_M_PART, _HLL_NUM_PART, _HLL_TAG_PART,
                "hll_parts")
    truth = lf.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("true_orders"),
        F.countDistinct("l_partkey").alias("true_parts"),
    )
    return (
        truth.join(est_o, "l_returnflag")
        .join(est_p, "l_returnflag")
        .select(
            "l_returnflag",
            "hll_orders", "true_orders",
            "hll_parts", "true_parts",
            F.when(
                (F.col("hll_orders") > 2.5 * _HLL_M_ORD)
                & (F.col("hll_parts") > 2.5 * _HLL_M_PART),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("int").alias("raw_regime"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    oracle="""
SELECT
  l_linestatus,
  ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
  ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price,
  ROUND(STDDEV_POP(l_quantity), 4) AS stdp_qty,
  ROUND(VAR_POP(l_quantity), 4) AS varp_qty,
  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
  ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS covarp_qty_price
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: statistical aggregates. Spark stddev/variance are the
    SAMPLE variants (match DuckDB *_samp). skewness/kurtosis use
    population formulas in Spark but sample-corrected in DuckDB, so
    they live in the rows-only `agg_stats_higher` query."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_linestatus").agg(
        r(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        r(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        r(F.stddev_pop("l_quantity"), 4).alias("stdp_qty"),
        r(F.var_pop("l_quantity"), 4).alias("varp_qty"),
        r(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        r(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        r(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covarp_qty_price"),
    )


@query(
    "agg_stats_higher",
    oracle="""
WITH m AS (
  SELECT l_linestatus, AVG(l_extendedprice) AS mu
  FROM lineitem GROUP BY l_linestatus)
SELECT l.l_linestatus,
  ROUND(AVG(POW(l_extendedprice - mu, 3))
        / POW(AVG(POW(l_extendedprice - mu, 2)), 1.5), 4) AS skew_price,
  ROUND(AVG(POW(l_extendedprice - mu, 4))
        / POW(AVG(POW(l_extendedprice - mu, 2)), 2) - 3, 4) AS kurt_price
FROM lineitem l JOIN m USING (l_linestatus)
GROUP BY l.l_linestatus
""",
)
def agg_stats_higher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5b: skewness/kurtosis. Spark uses POPULATION formulas
    (m3/m2^1.5 and excess m4/m2²-3); DuckDB's built-ins are
    sample-adjusted, so the oracle recomputes the population
    moments two-pass (centered powers around the group mean —
    numerically stable, no raw-moment cancellation)."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_linestatus").agg(
        r(F.skewness("l_extendedprice"), 4).alias("skew_price"),
        r(F.kurtosis("l_extendedprice"), 4).alias("kurt_price"),
    )


@query(
    "agg_percentile",
    oracle="""
SELECT
  l_returnflag,
  ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price,
  ROUND(MEDIAN(l_extendedprice), 4) AS median_price,
  ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75_price,
  ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact percentiles — Spark `percentile` and DuckDB
    `quantile_cont` both use linear interpolation."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_returnflag").agg(
        r(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        r(F.median("l_extendedprice"), 4).alias("median_price"),
        r(F.percentile("l_extendedprice", 0.75), 4).alias("p75_price"),
        r(F.percentile("l_quantity", 0.9), 4).alias("p90_qty"),
    )


@query("agg_percentile_approx")  # sketch-based — rows-only
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6b: approx percentile (Greenwald-Khanna sketch) — the
    at-scale variant; accuracy asserted vs exact in tests."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx_median")
    )


@query(
    "agg_collect",
    oracle="""
SELECT
  c_mktsegment,
  ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT c_nationkey)), ',') AS nations,
  CAST(COUNT(*) AS BIGINT) AS n_cust
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: collect_set, order-normalized with array_sort so the
    value-hash is deterministic (collect order is partition-order
    dependent by design). The sorted set is surfaced as a
    comma-joined string, not a raw array column: grading harnesses
    canonicalize rows with pandas sort/hash, and list cells are
    unhashable there — same idiom as agg_string_agg."""
    cust = load_table(spark, sf_dir, "customer")
    nations = F.array_sort(F.collect_set("c_nationkey"))
    return cust.groupBy("c_mktsegment").agg(
        F.concat_ws(
            ",", F.transform(nations, lambda x: x.cast("string"))
        ).alias("nations"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: CUBE with grouping_id — one Expand + single agg pass."""
    lf = load_table(spark, sf_dir, "lineitem")
    return (
        lf.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            r(F.sum("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_extendedprice), 2) AS sum_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8b: ROLLUP hierarchy totals."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.rollup("l_returnflag", "l_linestatus").agg(
        r(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_having",
    oracle="""
SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING ROUND(SUM(o_totalprice), 2) > 400000
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: post-aggregation filter (HAVING). The threshold applies
    to the ROUNDED sum on both sides so engine float-sum-order
    differences can't flip membership at the boundary."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            r(F.sum("o_totalprice")).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("total_spend") > 400000)
    )


@query(
    "agg_pivot",
    oracle="""
SELECT
  user_id,
  ROUND(SUM(value) FILTER (event_type = 'click'), 2) AS click,
  ROUND(SUM(value) FILTER (event_type = 'error'), 2) AS error,
  ROUND(SUM(value) FILTER (event_type = 'purchase'), 2) AS purchase,
  ROUND(SUM(value) FILTER (event_type = 'signup'), 2) AS signup,
  ROUND(SUM(value) FILTER (event_type = 'view'), 2) AS view
FROM events
GROUP BY user_id
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: pivot event_type → columns. Explicit value list avoids
    the extra distinct-values job — mandatory at scale."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = ev.groupBy("user_id").pivot("event_type", kinds).agg(F.sum("value"))
    return piv.select("user_id", *[r(F.col(k)).alias(k) for k in kinds])


@query(
    "agg_conditional",
    oracle="""
SELECT
  l_returnflag,
  ROUND(SUM(CASE WHEN l_discount > 0.05
                 THEN l_extendedprice ELSE 0 END), 2) AS high_disc_price,
  CAST(COUNT(*) FILTER (l_quantity >= 25) AS BIGINT) AS n_bulk,
  ROUND(AVG(l_extendedprice) FILTER (l_tax = 0), 4) AS avg_price_notax
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: filtered/conditional aggregates — one pass, no self-join."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_returnflag").agg(
        r(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                    0.0
                )
            )
        ).alias("high_disc_price"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        r(F.avg(F.when(F.col("l_tax") == 0, F.col("l_extendedprice"))), 4).alias(
            "avg_price_notax"
        ),
    )


@query(
    "agg_bool",
    oracle="""
SELECT l_returnflag,
       BOOL_OR(l_discount > 0.09)  AS any_deep_discount,
       BOOL_AND(l_quantity >= 1)   AS all_positive_qty,
       COUNT(*) FILTER (WHERE l_tax = 0) AS n_tax_free
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates any/every/count_if — short-circuitable
    partials (a partition that has seen TRUE for `any` never
    re-examines the flag), all map-side combinable."""
    lf = load_table(spark, sf_dir, "lineitem")
    return lf.groupBy("l_returnflag").agg(
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_positive_qty"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


@query(
    "agg_corr_pairs",
    oracle="""
SELECT CAST(label AS BIGINT) AS label,
       ROUND(CORR(CAST(embedding[1] AS DOUBLE), CAST(embedding[2] AS DOUBLE)), 6)
         AS corr_d0_d1,
       ROUND(CORR(CAST(embedding[1] AS DOUBLE), CAST(embedding[3] AS DOUBLE)), 6)
         AS corr_d0_d2,
       ROUND(CORR(CAST(embedding[2] AS DOUBLE), CAST(embedding[3] AS DOUBLE)), 6)
         AS corr_d1_d2
FROM embeddings
GROUP BY label
""",
)
def agg_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between embedding dimensions per
    class — the feature-redundancy screen run before model training.
    Each corr is one streaming co-moment aggregate (map-side partial,
    tiny final state); the full 64×64 matrix at scale is the same
    plan via `ml.stat.Correlation` on the assembled vector. DuckDB
    lists are 1-based, Spark arrays 0-based — the oracle indexes
    shift by one."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = [F.col("embedding")[i].cast("double") for i in range(3)]
    return emb.groupBy("label").agg(
        r(F.corr(d[0], d[1]), 6).alias("corr_d0_d1"),
        r(F.corr(d[0], d[2]), 6).alias("corr_d0_d2"),
        r(F.corr(d[1], d[2]), 6).alias("corr_d1_d2"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters sketch (`approx_top_k`): a bounded-memory
    frequency summary mergeable across partitions — the streaming/
    at-scale substitute for a full GROUP BY when only the head of
    the distribution matters. k exceeds the event-type cardinality
    here, so the sketch is exact and the full-aggregate oracle
    hash-matches; at real cardinality this op is rows-only by
    nature."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 32)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("event_type"),
        F.col("e.count").alias("n_events"),
    )


@query(
    "agg_string_agg",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
         AS priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): collect a
    DISTINCT set per group, sort, join. The sort makes the result
    deterministic under any partitioning — bare listagg's element
    order is shuffle-dependent and would never hash-match. Distinct
    sets stay bounded (enum-like columns), so the collected state is
    tiny even when groups are billions of rows."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_unpivot",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS sum_price,
         CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value
FROM s UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide metrics → long key/value rows) after a grouped
    aggregate — the melt step of metric pipelines. Spark's `unpivot`
    is a zero-shuffle projection (each wide row expands in place),
    so the only exchange is the upstream aggregation's."""
    lf = load_table(spark, sf_dir, "lineitem")
    s = lf.groupBy("l_returnflag").agg(
        sum_cents(cents("l_quantity"), "sum_qty", 2),
        sum_cents(cents("l_extendedprice"), "sum_price", 2),
        sum_cents(cents("l_discount"), "sum_disc", 2),
    )
    return s.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


@query("agg_hll_sketch_union")  # Datasketches HLL binary — no SQL twin: rows-only
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL):
    build one HLL sketch of l_partkey per return flag, then UNION
    the per-group sketches into a corpus-wide estimate — all without
    re-touching the data. This is THE 100 TB pattern for distinct
    counts: sketches are tiny (KB), associative, and partial-
    aggregable, so per-partition sketches combine map-side, per-day
    sketches roll up to monthly, and a global count never needs a
    global shuffle of raw values. Deterministic for fixed input (no
    RNG — hash-based), but no engine-independent SQL twin exists, so
    the oracle is the tolerance test in tests/test_operators.py
    (estimates within 5% of exact, union consistent with parts)."""
    lf = load_table(spark, sf_dir, "lineitem")
    per = lf.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count_distinct("l_partkey").alias("exact_distinct_parts"),
    )
    groups = per.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("approx_distinct_parts"),
        "exact_distinct_parts",
    )
    overall = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
            "approx_distinct_parts"
        )
    ).select(
        F.lit("ALL").alias("l_returnflag"),
        "approx_distinct_parts",
        F.lit(None).cast("long").alias("exact_distinct_parts"),
    )
    return groups.unionByName(overall)


# Register-table CTE shared by the portable sketch-union oracle:
# one (group, register) table of md5-derived rank maxima — the SAME
# geometry, tag and 48-bit window as `agg_hll_distinct_portable`'s
# parts sketch, so the registers here are the bit-identical values
# already pinned stable at every fixture SF.
_HLL_UNION_REG_SQL = f"""
  SELECT l_returnflag, j,
         MAX(CASE WHEN w = 0 THEN 49
                  ELSE 49 - length(bin(w)) END) AS mj
  FROM (
    SELECT l_returnflag,
           CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)
                                       || '{_HLL_TAG_PART}'), 1, 4))
                AS BIGINT) % {_HLL_M_PART} AS j,
           CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)
                                       || '{_HLL_TAG_PART}'), 5, 12))
                AS BIGINT) AS w
    FROM lineitem) h
  GROUP BY 1, 2
"""

_HLL_UNION_EST_SQL = f"""ROUND({_HLL_NUM_PART!r}
        / CAST(s_part + ({_HLL_M_PART} - n_reg)
               * (CAST(1 AS BIGINT) << 49) AS DOUBLE), 2)"""


@query(
    "agg_hll_sketch_union_portable",
    oracle=f"""
WITH reg AS ({_HLL_UNION_REG_SQL}),
per AS (
  SELECT l_returnflag, {_HLL_UNION_EST_SQL} AS hll_parts
  FROM (
    SELECT l_returnflag,
           CAST(SUM(CAST(1 AS BIGINT) << (49 - mj)) AS BIGINT) AS s_part,
           COUNT(*) AS n_reg
    FROM reg GROUP BY 1) s),
ureg AS (SELECT j, MAX(mj) AS mj FROM reg GROUP BY 1),
uest AS (
  SELECT {_HLL_UNION_EST_SQL} AS hll_parts
  FROM (
    SELECT CAST(SUM(CAST(1 AS BIGINT) << (49 - mj)) AS BIGINT) AS s_part,
           COUNT(*) AS n_reg
    FROM ureg) s),
exact AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts
  FROM lineitem GROUP BY 1)
SELECT p.l_returnflag, p.hll_parts, e.exact_distinct_parts
FROM per p JOIN exact e USING (l_returnflag)
UNION ALL
SELECT 'ALL' AS l_returnflag, hll_parts,
       CAST(NULL AS BIGINT) AS exact_distinct_parts
FROM uest
""",
)
def agg_hll_sketch_union_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`agg_hll_sketch_union`'s SQL-hash-oracled twin (VERDICT r13
    #3, the same graduation move as `agg_hll_distinct_portable`):
    per-group md5-register HLL sketches of l_partkey are MERGED into
    a corpus-wide estimate by register-wise MAX — the mergeable-
    sketch rollup pattern demonstrated end-to-end with engine-
    portable arithmetic, so BOTH the per-group estimates and the
    union estimate hash-match DuckDB bit-for-bit (the property the
    native DataSketches binary in the twin op can't offer; that op
    stays registered as the Spark-API ground truth).

    The union is computed FROM the per-group register table, never
    by re-scanning the data with a coarser grouping — at 100 TB the
    register build is one map-side-combinable hash aggregate keyed
    (group, j) collapsing to ≤ m rows per group per partition before
    the exchange, and every rollup after it (per-day → monthly →
    global) touches only ≤ groups×m register rows. Geometry, tag and
    estimator contract are `_HLL_M_PART`'s (raw-regime only; see the
    note above `_HLL_M_ORD`); the exact per-group distinct count
    rides along for error visibility, NULL on the union row (exact
    union would need the re-scan the sketch exists to avoid)."""
    lf = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat(F.col("l_partkey").cast("string"), F.lit(_HLL_TAG_PART))
    )
    # localCheckpoint: the tiny register table (≤ groups×m rows)
    # feeds BOTH the per-group estimates and the union rollup — two
    # consumers that would otherwise each re-run the corpus-wide
    # register aggregate.
    reg = (
        lf.select(
            "l_returnflag",
            (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
             % _HLL_M_PART).alias("j"),
            F.conv(F.substring(h, 5, 12), 16, 10).cast("long").alias("w"),
        )
        .groupBy("l_returnflag", "j")
        .agg(
            F.max(
                F.when(F.col("w") == 0, F.lit(49)).otherwise(
                    F.lit(49) - F.length(F.bin("w"))
                )
            ).alias("mj")
        )
        .localCheckpoint()
    )

    scaled = F.col("s_part") + (
        (F.lit(_HLL_M_PART).cast("long") - F.col("n_reg")) * F.lit(2**49)
    )
    est = F.round(
        F.lit(_HLL_NUM_PART) / scaled.cast("double"), 2
    ).alias("hll_parts")
    sums = [
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - mj)")).alias("s_part"),
        F.count(F.lit(1)).alias("n_reg"),
    ]
    per = reg.groupBy("l_returnflag").agg(*sums).select("l_returnflag", est)
    # register-wise MAX: the sketch-union operation itself
    ureg = reg.groupBy("j").agg(F.max("mj").alias("mj"))
    overall = ureg.agg(*sums).select(
        F.lit("ALL").alias("l_returnflag"),
        est,
        F.lit(None).cast("long").alias("exact_distinct_parts"),
    )
    exact = lf.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct_parts")
    )
    return per.join(exact, "l_returnflag").unionByName(overall)


@query(
    "agg_mode",
    oracle="""
WITH c AS (
  SELECT o_orderpriority, YEAR(o_orderdate) AS y, COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
r AS (
  SELECT y, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY y ORDER BY n DESC, o_orderpriority)
           AS rk
  FROM c)
SELECT CAST(y AS BIGINT) AS o_year, o_orderpriority AS mode_priority,
       CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic statistical mode per group (most frequent
    order priority per order year). Built as count-then-argmax with
    an explicit value tiebreak rather than the engines' native
    `mode()` (both Spark and DuckDB leave ties implementation-
    defined — a hash gate cannot tolerate that). Two partial-
    aggregable hash aggregates over tiny keyspaces; the window runs
    on the #years × #priorities frame, not the data."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("o_year").orderBy(F.desc("n"), "o_orderpriority")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_year", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@query(
    "agg_count_min_topk",
    oracle="""
WITH rows_k AS (
  SELECT l_partkey AS k, r
  FROM lineitem CROSS JOIN range(4) t(r)),
hashed AS (
  SELECT k, r,
         CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || '_'
                                      || CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS col
  FROM rows_k),
sketch AS (
  SELECT r, col, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY r, col),
cand AS (
  SELECT DISTINCT k, r,
         CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || '_'
                                      || CAST(k AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS col
  FROM rows_k),
est AS (
  SELECT c.k, MIN(s.cnt) AS cm_estimate
  FROM cand c JOIN sketch s ON s.r = c.r AND s.col = c.col
  GROUP BY c.k),
truth AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM lineitem GROUP BY l_partkey)
SELECT e.k AS part, e.cm_estimate, t.true_count,
       e.cm_estimate - t.true_count AS overestimate
FROM est e JOIN truth t ON t.k = e.k
ORDER BY e.cm_estimate DESC, e.k
LIMIT 10
""",
)
def agg_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: top-10 parts by CM estimate
    (depth 4 × width 64, rows hashed with md5-derived functions so
    both engines build the bit-identical sketch), joined against
    exact counts to surface the overestimate — CM never
    underestimates, asserted in tests. Complements the native
    `agg_approx_top_k`: this is the sketch you OWN, i.e. the one
    that can be merged across days/streams by cell-wise addition.

    Scale: ONE fact pass (the exact-count aggregate, fully map-side
    combinable); everything downstream — sketch cells, candidates,
    estimates — is vocabulary-sized. The estimate pass touches only
    DISTINCT keys against the 256-row broadcast sketch.

    r16 (guide §2.4): the candidate key set IS the exact-count
    aggregate's key set — the old plan ran `li.distinct()` as a
    third full pass over the fact keys and then joined the estimate
    back to `truth` on k. Deriving the candidates FROM `truth`
    (carrying true_count through the 256-row broadcast probe and
    the min-over-rows regroup — true_count is functionally
    dependent on k, so grouping by both keeps groups identical)
    removes one corpus-scale scan+shuffle AND the vocabulary-scale
    est⋈truth join: 3 lineitem passes → 2, 3 exchanges → 2,
    plan-pinned. Results bit-identical (oracle-verified ×3 SFs;
    interleaved A/B at sf0.1: min 4.89 s → 4.36 s).

    r17 (guide §2.4): the remaining second fact pass (explode every
    row ×4 + md5 per expanded row, aggregated to 256 cells) is
    redundant too — COUNT(*) per cell over the row expansion equals
    SUM(true_count) over the keys hashing to that cell, so the
    sketch now derives from `truth`: 2 fact passes → 1 (single
    `Scan parquet` + ReusedExchange in the plan, pinned), ~15× fewer
    md5 evaluations. Results bit-identical (same exact integers)."""
    width = 64
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    r_col = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    col = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit("_"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    # r17 (guide §2.4): the sketch was built by a SECOND full fact
    # pass (explode every lineitem row ×4, md5 each — 2.4M md5s at
    # sf0.1) aggregated to 256 cells. But COUNT(*) per (r, col) over
    # the row expansion equals SUM(true_count) over the KEYS hashing
    # to that cell (every row of key k lands in exactly the cells of
    # k), so the sketch derives from `truth` — vocabulary-scale, one
    # md5 per key per row-hash instead of per fact row: 2 fact
    # passes → 1, 2.4M md5s → 160k. Both sketch and cand consume the
    # same truth aggregate, whose exchange subtree canonicalizes
    # identically (ReusedExchange). cnt is bit-identical (sum of
    # exact per-key counts = exact cell count).
    sketch = (
        truth.select("k", "true_count", r_col)
        .withColumn("col", col)
        .groupBy("r", "col")
        .agg(F.sum("true_count").alias("cnt"))
    )
    cand = truth.select("k", "true_count", r_col).withColumn("col", col)
    est = (
        cand.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("k", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return (
        est.select(
            F.col("k").alias("part"),
            "cm_estimate",
            "true_count",
            (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("cm_estimate"), "part")
        .limit(10)
    )
