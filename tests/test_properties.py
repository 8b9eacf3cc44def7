"""Property-based algebraic invariants (SURVEY.md §5.4): hypothesis
generates small row sets; the invariants must hold for ANY data, not
just the fixtures. Example counts are kept low because every example
is a real Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

SMALL = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# rows of (key, value-with-nulls)
rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=0,
    max_size=12,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")


@SMALL
@given(a=rows_st, b=rows_st)
def test_union_all_count_additivity(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.union(db).count() == len(a) + len(b)


@SMALL
@given(a=rows_st)
def test_filter_partitions_rows_under_3vl(spark, a):
    """filter(p) + filter(NOT p) + filter(p IS NULL) == all rows —
    the three-valued-logic partition of any predicate."""
    da = _df(spark, a)
    p = F.col("v") > 0
    n = da.filter(p).count() + da.filter(~p).count() + da.filter(p.isNull()).count()
    assert n == len(a)


@SMALL
@given(a=rows_st)
def test_distinct_is_idempotent(spark, a):
    da = _df(spark, a).distinct()
    assert da.distinct().count() == da.count()


@SMALL
@given(a=rows_st, b=rows_st)
def test_intersect_except_all_partition_left_side(spark, a, b):
    """INTERSECT ALL and EXCEPT ALL split the left multiset exactly."""
    da, db = _df(spark, a), _df(spark, b)
    assert (
        da.intersectAll(db).count() + da.exceptAll(db).count() == len(a)
    )


@SMALL
@given(a=rows_st, b=rows_st)
def test_inner_join_bounded_by_cross(spark, a, b):
    da, db = _df(spark, a), _df(spark, b).withColumnRenamed("v", "w")
    inner = da.join(db, "k", "inner").count()
    assert inner <= len(a) * len(b)
    # and left outer preserves every left row at least once
    left = da.join(db, "k", "left").count()
    assert left >= len(a)


@SMALL
@given(a=rows_st)
def test_row_number_is_permutation_per_partition(spark, a):
    da = _df(spark, a)
    w = W.partitionBy("k").orderBy(F.col("v").asc_nulls_first())
    rn = da.withColumn("rn", F.row_number().over(w))
    got = {
        (r["k"], r["rn"]) for r in rn.collect()
    }
    sizes: dict[int, int] = {}
    for k, _ in a:
        sizes[k] = sizes.get(k, 0) + 1
    want = {(k, i) for k, n in sizes.items() for i in range(1, n + 1)}
    assert got == want


def test_asof_matches_bruteforce_on_random_timelines(spark):
    """The linear union-sort asof must agree with the O(n^2)
    definition on seeded random event timelines, including ties
    (click at exactly the purchase ts counts) and users with no
    prior click (dropped)."""
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(0, 25)):
            eid += 1
            rows.append(
                (
                    eid,
                    user,
                    rng.randint(0, 50),  # coarse ts -> many ties
                    rng.choice(["click", "purchase", "view"]),
                )
            )
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "tsec", "event_type"]
    ).withColumn("ts", F.timestamp_seconds(F.col("tsec"))).drop("tsec")

    import infofarmsparkml_spark.operators.joins as J
    from unittest import mock

    with mock.patch.object(J, "load_table", lambda s, d, n: df):
        got = {
            r["purchase_id"]: (r["click_id"], r["click_ts"])
            for r in J.join_asof(spark, "ignored").collect()
        }

    data = df.collect()
    expect = {}
    for p in data:
        if p["event_type"] != "purchase":
            continue
        cands = [c for c in data if c["event_type"] == "click"
                 and c["user_id"] == p["user_id"] and c["ts"] <= p["ts"]]
        if cands:
            best = max(cands, key=lambda c: (c["ts"], c["event_id"]))
            expect[p["event_id"]] = (best["event_id"], best["ts"])
    assert got == expect


def test_compare_frames_catches_wrongness():
    """Meta-test of the oracle gate itself: the comparator must
    accept row-order permutations (the driver sorts) but reject
    value drift, row-count drift, and schema drift — otherwise every
    green parity row in this suite is meaningless."""
    import pandas as pd

    from infofarmsparkml_spark.verify import compare_frames

    base = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
    ok, _ = compare_frames(base, base.sample(frac=1.0, random_state=7))
    assert ok, "row order must not matter"
    ok, _ = compare_frames(base, base.assign(v=[1.5, 2.5, 3.6]))
    assert not ok, "a changed value must fail the hash"
    ok, _ = compare_frames(base, base.head(2))
    assert not ok, "a dropped row must fail"
    ok, _ = compare_frames(base, base.rename(columns={"v": "w"}))
    assert not ok, "a renamed column must fail the schema check"
    ok, _ = compare_frames(base, base.assign(v=base["v"].astype("int64")))
    assert not ok, "a changed dtype family must fail"


@SMALL
@given(
    series=st.lists(
        st.integers(min_value=0, max_value=49000), min_size=1, max_size=25
    )
)
def test_ewma_weight_algebra_bounded_and_convex(spark, series):
    """The finite-window EWMA expression used by ts_ewma, applied to
    ANY integer-cent series: every output is a convex combination of
    its trailing frame, so min(frame) <= ewma <= max(frame), and a
    constant series is a fixed point."""
    rows = [(i, c) for i, c in enumerate(series)]
    df = spark.createDataFrame(rows, "i long, vc long")
    w = W.orderBy("i").rowsBetween(-9, 0)
    vs = F.collect_list("vc").over(w)
    d = df.select("i", "vc", vs.alias("vs"))
    n = F.size("vs")
    num = F.aggregate(
        F.zip_with(
            F.col("vs"),
            F.sequence(F.lit(1), n),
            lambda v, i: v
            * F.pow(F.lit(2.0), (F.lit(9) - n + i).cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    den = F.pow(F.lit(2.0), 10) - F.pow(F.lit(2.0), (F.lit(10) - n).cast("double"))
    out = d.select("i", "vc", (num.cast("double") / den).alias("e")).collect()
    vals = {r.i: r.vc for r in out}
    for r in out:
        frame = [vals[j] for j in range(max(0, r.i - 9), r.i + 1)]
        assert min(frame) - 1e-9 <= r.e <= max(frame) + 1e-9
    if len(set(series)) == 1:
        assert all(abs(r.e - series[0]) < 1e-9 for r in out)


@SMALL
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=0,
        max_size=20,
        unique=True,
    )
)
def test_grid_join_algebra_equals_brute_force(spark, pts):
    """The grid-bucket + 3x3-probe candidate algebra used by
    join_spatial_grid, on ANY integer point set: identical pair set
    to the brute-force cross join — no boundary pair lost, none
    duplicated."""
    d, d2 = 15, 225
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    p = spark.createDataFrame(rows, "k long, x long, y long")
    homed = p.withColumn("cx", F.floor(F.col("x") / d)).withColumn(
        "cy", F.floor(F.col("y") / d)
    )
    probes = (
        homed.select("k", "x", "y", "cx", "cy",
                     F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dx"))
        .select("k", "x", "y", (F.col("cx") + F.col("dx")).alias("cx"), "cy",
                F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"))
        .select("k", "x", "y", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    a, b = probes.alias("a"), homed.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    got = {
        (r.ka, r.kb)
        for r in a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .filter(dist2 <= d2)
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .collect()
    }
    brute = {
        (i, j)
        for i, (x1, y1) in enumerate(pts)
        for j, (x2, y2) in enumerate(pts)
        if i < j and (x1 - x2) ** 2 + (y1 - y2) ** 2 <= d2
    }
    assert got == brute


# ---- pure-Python properties (no Spark job per example) ----

cell_st = st.one_of(
    st.none(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.booleans(),
    st.text(max_size=8),
    st.datetimes(),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(cell_st, cell_st, cell_st), min_size=0, max_size=20
    )
)
def test_canon_frame_matches_per_cell_reference(rows):
    """The r5 column-wise canonicalizer must produce EXACTLY the
    strings of the original per-cell row-records path for any frame
    — the comparator is the correctness gate, so its rewrite gets a
    property proof, not just the fixture runs."""
    import pandas as pd

    from infofarmsparkml_spark.verify import canon_cell, canon_frame

    pdf = pd.DataFrame(rows, columns=["a", "b", "c"])

    def reference(p):
        cols = sorted(p.columns)
        out = [
            tuple(canon_cell(row[c]) for c in cols)
            for row in p.to_dict(orient="records")
        ]
        out.sort()
        return cols, out

    assert canon_frame(pdf) == reference(pdf)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-100.0, max_value=100.0, allow_nan=False))
def test_srp_quantization_is_exact_exponent_shift(x):
    """floor(x * 2^20) must be computable without rounding error for
    any float in the embedding range: multiplying a double by a
    power of two only changes the exponent, so the product is exact
    and both engines' floor agrees. This is the invariant the
    SRP-LSH engine parity rests on."""
    import math
    from fractions import Fraction

    exact = math.floor(Fraction(x) * 1048576)
    assert math.floor(x * 1048576.0) == exact


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=1 << 40))
def test_adaptive_band_bits_matches_sql_case_chain(n):
    """The kNN join derives its SRP band width from the corpus row
    count twice — `_adaptive_band_bits` in Python (plan geometry)
    and `_BAND_BITS_CASE_SQL` in the DuckDB oracle. The two are
    generated from the same integer shifts; this property pins that
    they agree at EVERY n, including power-of-two boundaries where
    an off-by-one in either chain would silently re-band the oracle
    only."""
    import duckdb

    from infofarmsparkml_spark.operators.llm import (
        _BAND_BITS_CASE_SQL,
        _adaptive_band_bits,
    )

    py_bits = _adaptive_band_bits(n)
    sql_bits = duckdb.sql(
        f"SELECT {_BAND_BITS_CASE_SQL} FROM (SELECT CAST({n} AS BIGINT) AS n)"
    ).fetchone()[0]
    assert sql_bits == py_bits
    assert 4 <= py_bits <= 20
    # monotone non-decreasing: more data never means fewer buckets
    assert _adaptive_band_bits(n + 1) >= py_bits


def test_srp_plane_pool_prefix_is_r5_stable():
    """`_SRP_W` grew 32 -> 256 planes for the adaptive kNN bands
    (r6), then 256 -> 320 when the adaptive cap rose 16 -> 20 bits
    (r12); growth must only ever APPEND — the first 32 rows MUST
    stay bit-identical because the near-dup detector's committed
    oracle (and its r5 driver hash record) addresses exactly those,
    and the first 256 carry every kNN hash witnessed through r11.
    Pin the md5 of both prefixes."""
    import hashlib
    import json

    from infofarmsparkml_spark.operators.llm import _SRP_W

    assert len(_SRP_W) == 320 and all(len(r) == 64 for r in _SRP_W)
    digest = hashlib.md5(
        json.dumps(_SRP_W[:32]).encode()
    ).hexdigest()
    assert digest == "bdf31b67cbbecc4b1a267f36f1ce16a8"
    digest256 = hashlib.md5(
        json.dumps(_SRP_W[:256]).encode()
    ).hexdigest()
    assert digest256 == "16234308d8b182926437963694d6a78c"


def test_vectorized_srp_and_qdist_match_reference_at_20_bits(spark):
    """r13 moved the SRP projection to an Arrow numpy int64 kernel
    and r14 moved the quantized distance again, to a 64-term
    unrolled codegen expression (_qdist — measured 8.7x faster than
    the Arrow kernel on the verify stream). Exactness is witnessed
    by oracle hashes at the fixture widths (4-5 bits) and by the
    4.5M-vector recall artifact at 17 bits — this test pins it IN
    CI at the full 20-bit / 320-plane geometry no fixture reaches:
    band keys and distances from the shipping kernels must equal an
    independent pure-Python evaluation of the original fold
    (dot > 0 sign bits, key = sum of 2^pos; exact integer
    arithmetic end to end)."""
    from infofarmsparkml_spark.operators.llm import (
        _SRP_W,
        _qdist,
        _srp_band_keys,
    )
    from pyspark.sql import functions as F

    # deterministic pseudo-vectors at quantized magnitude (~2^20)
    vecs = {
        i: [((i * 2654435761 + j * 40503) % 2000001) - 1000000
            for j in range(64)]
        for i in range(40)
    }
    n_bands, bits = 16, 20
    quant = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, qv array<long>"
    )
    got = {
        (r.vec_id, r.band): r.bkey
        for r in _srp_band_keys(quant, n_bands, bits).collect()
    }
    assert len(got) == 40 * n_bands
    for i, v in vecs.items():
        signs = [
            sum(a * b for a, b in zip(v, _SRP_W[h])) > 0
            for h in range(n_bands * bits)
        ]
        for band in range(n_bands):
            key = sum(
                1 << pos
                for pos in range(bits)
                if signs[band * bits + pos]
            )
            assert got[(i, band)] == key, (i, band)

    pairs = spark.createDataFrame(
        [(i, vecs[i], vecs[(i + 7) % 40]) for i in range(40)],
        "i long, va array<long>, vb array<long>",
    )
    dist = {
        r.i: r.d
        for r in pairs.select("i", _qdist("va", "vb").alias("d")).collect()
    }
    for i in range(40):
        ref = sum(
            (x - y) * (x - y)
            for x, y in zip(vecs[i], vecs[(i + 7) % 40])
        )
        assert dist[i] == ref, i


def test_hash_sample_membership_partition_invariant(spark, sf_dir):
    """The md5-threshold sample's core claim (round 10): membership
    is a property of the ROW, so the selected key set is identical
    under any physical partitioning — unlike .sample(seed=), whose
    draw depends on partition layout. Verified against 1, 7, and 32
    partitions of the same source."""
    from infofarmsparkml_spark.registry import get

    fn, _ = get("sample_hash_deterministic")
    base = fn(spark, sf_dir)

    def keys(df):
        return {
            (r["l_orderkey"], r["l_linenumber"]) for r in df.collect()
        }

    expected = keys(base)
    assert expected  # non-degenerate sample at every fixture SF
    from infofarmsparkml_spark.operators._util import load_table

    lf = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F2

    for n in (1, 7, 32):
        got = keys(
            lf.repartition(n)
            .filter(
                F2.substring(
                    F2.md5(
                        F2.concat_ws("|", "l_orderkey", "l_linenumber")
                    ),
                    1,
                    8,
                )
                < F2.lit("1a000000")
            )
            .select("l_orderkey", "l_linenumber", "l_quantity")
        )
        assert got == expected, f"membership drifted at {n} partitions"


def test_stratified_hash_sample_rates_and_invariance(spark, sf_dir):
    """llm_stratified_sample_hash (round 11): per-stratum membership
    is a pure function of doc_id, so (a) 1.0-fraction strata keep
    every doc, (b) unmapped strata would drop (none in the fixture),
    (c) downsampled strata track their fraction within a loose
    binomial band, and (d) the kept doc_id set is invariant under
    repartitioning. Leg (d) drives THE OPERATOR over the
    repartitioned frame (load_table monkeypatched in the operator's
    module — ADVICE r11: an inline re-implementation of the
    threshold filter would keep passing if the operator's own
    threshold drifted)."""
    from pyspark.sql import functions as F2

    from infofarmsparkml_spark.operators._util import load_table
    from infofarmsparkml_spark.registry import get

    fn, _ = get("llm_stratified_sample_hash")
    kept = fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F2.count(F2.lit(1)).alias("n")).collect()
    }
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang in ("de", "fr", "es"):
        assert len(by_lang.get(lang, ())) == totals[lang], lang
    for lang, frac in (("en", 0.5), ("zh", 0.25)):
        rate = len(by_lang.get(lang, ())) / totals[lang]
        assert abs(rate - frac) < 0.15, (lang, rate)
    expected = {r["doc_id"] for r in kept}
    from infofarmsparkml_spark.operators import llm as llm_mod

    real_load_table = llm_mod.load_table
    for n in (1, 7):
        try:
            llm_mod.load_table = (
                lambda s, d, t, _n=n: real_load_table(s, d, t).repartition(_n)
            )
            got = {r["doc_id"] for r in fn(spark, sf_dir).collect()}
        finally:
            llm_mod.load_table = real_load_table
        assert got == expected, f"membership drifted at {n} partitions"


def test_spark_rng_sample_is_partition_sensitive_demo(spark, sf_dir):
    """The counter-property that motivates the hash twin: Spark's
    seeded Bernoulli sample is documented here as partition-layout
    DEPENDENT — the same seed over the same rows yields a different
    subset when the partitioning differs. (If a future Spark makes
    it layout-stable this starts failing and the twin's docstring
    claim should be revisited.)"""
    from infofarmsparkml_spark.operators._util import load_table

    lf = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )

    def keys(df):
        return {(r["l_orderkey"], r["l_linenumber"]) for r in df.collect()}

    a = keys(lf.repartition(1).sample(fraction=0.1, seed=42))
    b = keys(lf.repartition(32).sample(fraction=0.1, seed=42))
    assert a != b
