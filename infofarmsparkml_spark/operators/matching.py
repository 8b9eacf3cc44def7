"""Blocked-matching operators (SURVEY.md §2 extensions): a
grid-bucketed spatial distance self-join and sorted-neighborhood
entity-resolution blocking — the two classic "all-pairs without
all-pairs" shapes.

Scale posture: both replace an O(n²) comparison with a partitioned
candidate generator. The spatial join buckets points into d×d grid
cells and probes only the 3×3 neighborhood — one shuffle on the cell
key, candidate count bounded by cell occupancy (skewed cells are an
AQE skew-join case, not a plan change). Sorted-neighborhood sorts
WITHIN a blocking key and compares each record to its w successors
via window `lead` — one exchange on the block key, no self-join, the
standard ER compromise between recall (w, block granularity) and
cost. Both emit integer-exact or same-expression-shape similarity
values so the DuckDB oracles hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query

# Grid pitch = the distance threshold, so all partners of a point
# lie inside its 3×3 cell neighborhood. Integer coordinates keep
# dist² exact (no float distance anywhere).
_D = 15
_D2 = _D * _D


@query(
    "join_spatial_grid",
    oracle="""
WITH p AS (
  SELECT c_custkey AS k,
         (c_custkey * 37) % 1000 AS x,
         (c_custkey * 91) % 1000 AS y
  FROM customer)
SELECT a.k AS key_a, b.k AS key_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM p a JOIN p b ON a.k < b.k
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 225
""",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within Euclidean distance 15 on a 1000×1000
    integer grid (coordinates derived deterministically from
    c_custkey so both engines see the same point set). Spark plan:
    bucket each point into its ⌊x/d⌋,⌊y/d⌋ cell, explode the LEFT
    side to its 9 neighbor cells, equi-join on the cell key, then
    exact dist² ≤ d² filter — each qualifying pair matches in
    EXACTLY one (offset, home-cell) combination, so no distinct
    pass. One shuffle on the cell key vs the oracle's O(n²) cross
    join; at 100 TB the cell key stays uniform (hash-derived
    coordinates), and a hot cell degrades to an AQE skew split, not
    a cartesian."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * 37) % 1000).alias("x"),
        ((F.col("c_custkey") * 91) % 1000).alias("y"),
    )
    return grid_pair_join(pts, _D)


def grid_pair_join(pts: DataFrame, d: int) -> DataFrame:
    """Grid-bucketed distance self-join core (shared by
    `join_spatial_grid` and the AQE hot-cell test): ``pts`` must
    have integer columns (k, x, y); returns all (key_a, key_b,
    dist2) pairs with key_a < key_b and dist² ≤ d². Each qualifying
    pair matches in exactly one (offset, home-cell) combination, so
    no distinct pass is needed."""
    d2 = d * d
    homed = pts.withColumn("cx", F.floor(F.col("x") / d)).withColumn(
        "cy", F.floor(F.col("y") / d)
    )
    off = F.explode(
        F.array([F.lit(i) for i in (-1, 0, 1)])
    )
    probes = (
        homed.select("k", "x", "y", "cx", "cy", off.alias("dx"))
        .select(
            "k",
            "x",
            "y",
            (F.col("cx") + F.col("dx")).alias("cx"),
            "cy",
            F.explode(F.array([F.lit(i) for i in (-1, 0, 1)])).alias("dy"),
        )
        .select("k", "x", "y", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    a, b = probes.alias("a"), homed.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .filter(dist2 <= d2)
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            dist2.cast("long").alias("dist2"),
        )
    )


@query(
    "er_sorted_neighborhood",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, source,
         list_distinct(string_split(text, ' ')) AS toks,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY text, doc_id) AS rn
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source
 AND b.rn - a.rn BETWEEN 1 AND 3
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
""",
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood duplicate detection over documents:
    within each (lang, source) block, sort by text and compare every
    record to its next 3 neighbors; emit pairs with token-set
    Jaccard ≥ 0.5. Spark plan: ONE window exchange on the block key
    with three `lead` probes — candidate generation costs w rows per
    record, never a self-join (the oracle's rn-range join is the
    O(n·w) relational twin). The block key choice is the classic
    recall/parallelism dial: (lang, source) here; production stacks
    multiple passes with different keys. Jaccard is a ratio of two
    integer set sizes computed in the same expression order on both
    engines — bit-stable without rounding tricks (ROUND(6) kept for
    schema symmetry only)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.col("text"), " "))
    w = W.partitionBy("lang", "source").orderBy("text", "doc_id")
    base = docs.select("doc_id", "lang", "source", "text", toks.alias("toks"))
    led = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.array(
            *[
                F.lead(F.struct("doc_id", "toks"), k).over(w)
                for k in (1, 2, 3)
            ]
        ).alias("nbs"),
    )
    nbrs = led.select(
        "doc_a", "toks_a", F.explode("nbs").alias("nb")
    ).filter(F.col("nb").isNotNull())
    inter = F.size(F.array_intersect("toks_a", "nb.toks")).cast("double")
    union = F.size(
        F.array_distinct(F.concat(F.col("toks_a"), F.col("nb.toks")))
    )
    jac = inter / union
    return nbrs.filter(jac >= 0.5).select(
        "doc_a",
        F.col("nb.doc_id").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )
