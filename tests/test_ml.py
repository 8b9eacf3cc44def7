"""ML known-answer tests (SURVEY.md §5.5): tiny synthetic datasets
with analytically known optima; metric thresholds, not row equality.
"""

from __future__ import annotations

import math
import os

import pytest

from tests.conftest import SF_DIR

from pyspark.sql import functions as F

from infofarmsparkml_spark import registry
from infofarmsparkml_spark.catalog import load_table


def q(name):
    fn, _ = registry.get(name)
    return fn


@pytest.fixture(scope="module")
def ml(spark):
    pytest.importorskip("pyspark.ml")
    return spark


def test_lr_separable(ml):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    rows = [([float(i), float(i) + 1.0], 0) for i in range(20)] + [
        ([float(i) + 10.0, float(i) + 12.0], 1) for i in range(20)
    ]
    df = ml.createDataFrame(rows, ["raw", "label"]).select(
        array_to_vector("raw").alias("features"), "label"
    )
    model = LogisticRegression(maxIter=50).fit(df)
    acc = (
        model.transform(df)
        .filter(F.col("prediction") == F.col("label"))
        .count()
    ) / df.count()
    assert acc == 1.0


def test_kmeans_three_blobs(ml):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    centers = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
    rows = [
        ([cx + dx, cy + dy], i)
        for i, (cx, cy) in enumerate(centers)
        for dx in (-1.0, 0.0, 1.0)
        for dy in (-1.0, 0.0, 1.0)
    ]
    df = ml.createDataFrame(rows, ["raw", "blob"]).select(
        array_to_vector("raw").alias("features"), "blob"
    )
    pred = KMeans(k=3, seed=42).fit(df).transform(df)
    # each blob maps to exactly one cluster and clusters don't merge
    mapping = (
        pred.groupBy("blob")
        .agg(F.collect_set("prediction").alias("clusters"))
        .collect()
    )
    clusters = [r["clusters"] for r in mapping]
    assert all(len(c) == 1 for c in clusters)
    assert len({c[0] for c in clusters}) == 3


def test_idf_formula_known_answer(ml):
    from pyspark.ml.feature import IDF, CountVectorizer

    df = ml.createDataFrame(
        [(0, ["a", "b"]), (1, ["a", "c"])], ["id", "toks"]
    )
    cv = CountVectorizer(inputCol="toks", outputCol="tf")
    cvm = cv.fit(df)
    tf = cvm.transform(df)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    vocab = cvm.vocabulary
    idf = dict(zip(vocab, idf_model.idf.toArray()))
    # Spark IDF = ln((m+1)/(df+1)); m=2 docs
    assert math.isclose(idf["a"], math.log(3 / 3), abs_tol=1e-9)
    assert math.isclose(idf["b"], math.log(3 / 2), abs_tol=1e-9)


def test_als_rank1_structure(ml):
    from pyspark.ml.recommendation import ALS

    # rank-1 ratings: r(u, i) = u_pref * i_score
    rows = [
        (u, i, float((u + 1) * (i + 1)))
        for u in range(8)
        for i in range(8)
        if (u + i) % 3 != 0  # holes to actually factorize
    ]
    df = ml.createDataFrame(rows, ["user", "item", "rating"])
    model = ALS(
        userCol="user", itemCol="item", ratingCol="rating",
        rank=2, maxIter=10, seed=42, regParam=0.05,
    ).fit(df)
    preds = model.transform(df)
    rmse = preds.select(
        F.sqrt(F.avg((F.col("rating") - F.col("prediction")) ** 2)).alias("rmse")
    ).collect()[0]["rmse"]
    assert rmse < 2.0, rmse


def test_ml_eval_trained_metrics_in_range(spark, sf_dir):
    row = q("ml_eval_trained")(spark, sf_dir).collect()[0]
    assert 0.0 <= row["lr_accuracy"] <= 1.0
    assert 0.0 <= row["lr_f1"] <= 1.0
    assert -1.0 <= row["kmeans_silhouette"] <= 1.0
    # embeddings are separable enough that LR beats majority class
    assert row["lr_accuracy"] > 0.3


def test_ml_eval_matches_mllib_evaluators(spark, sf_dir):
    """ml_eval's hand-rolled count arithmetic must equal what the
    MLlib evaluators compute on the SAME deterministic predictions
    — proving the oracled metric math is the evaluators' math."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    row = q("ml_eval")(spark, sf_dir).collect()[0]
    emb = load_table(spark, sf_dir, "embeddings")
    pred = emb.select(
        (F.col("label") >= 5).cast("double").alias("label"),
        (
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            >= 0
        )
        .cast("double")
        .alias("prediction"),
    )
    ev = lambda metric, **kw: MulticlassClassificationEvaluator(  # noqa: E731
        labelCol="label", predictionCol="prediction", metricName=metric, **kw
    ).evaluate(pred)
    assert abs(row["accuracy"] - ev("accuracy")) < 1e-6
    assert abs(row["prec"] - ev("precisionByLabel", metricLabel=1.0)) < 1e-6
    assert abs(row["recall"] - ev("recallByLabel", metricLabel=1.0)) < 1e-6
    assert abs(row["f1"] - ev("fMeasureByLabel", metricLabel=1.0)) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_ml_pca_truncated_variance_capture(spark, sf_dir):
    """The full-rank registry query pins PCA numerically via norm
    preservation; this covers the TRUNCATED use: top-8 components
    must explain a non-trivial, monotone-decreasing variance
    share."""
    from pyspark.ml.feature import PCA, StandardScaler

    from infofarmsparkml_spark.operators.ml import _embedding_features

    data = _embedding_features(spark, sf_dir)
    scaled = (
        StandardScaler(
            inputCol="features", outputCol="scaled", withMean=True, withStd=True
        )
        .fit(data)
        .transform(data)
    )
    model = PCA(k=8, inputCol="scaled", outputCol="pc").fit(scaled)
    ev = list(model.explainedVariance)
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    assert 0 < sum(ev) <= 1.0 + 1e-9


def test_sentiment_lexicon_known_answer(spark):
    from infofarmsparkml_spark.operators.ml import SENTIMENT_LEXICON

    lex = dict(SENTIMENT_LEXICON)
    assert lex["fast"] + lex["slow"] == 0
    docs = spark.createDataFrame(
        [(0, "fast fast slow"), (1, "nothing here")], ["doc_id", "text"]
    )
    lexdf = spark.createDataFrame(SENTIMENT_LEXICON, ["word", "score"])
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    scored = (
        tok.join(lexdf, tok.token == lexdf.word, "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("score"), F.lit(0)).alias("s"))
        .collect()
    )
    got = {r["doc_id"]: r["s"] for r in scored}
    assert got == {0: 1, 1: 0}


def test_decision_tree_separable(ml):
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.functions import array_to_vector

    # axis-aligned separable: x0 < 0 → class 0, x0 > 0 → class 1
    rows = [([float(i - 10), 0.0], 0 if i < 10 else 1) for i in range(20) if i != 10]
    df = ml.createDataFrame(rows, ["arr", "label"]).select(
        array_to_vector("arr").alias("features"), "label"
    )
    model = DecisionTreeClassifier(maxDepth=2, seed=42).fit(df)
    preds = model.transform(df)
    n_wrong = preds.filter(F.col("prediction") != F.col("label")).count()
    assert n_wrong == 0


def test_naive_bayes_two_vocab_classes(ml):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import HashingTF, StringIndexer, Tokenizer

    rows = [("aaa aaa bbb", "x")] * 5 + [("ccc ddd ddd", "y")] * 5
    df = ml.createDataFrame(rows, ["text", "lang"])
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            HashingTF(inputCol="words", outputCol="features", numFeatures=64),
            StringIndexer(inputCol="lang", outputCol="label"),
            NaiveBayes(featuresCol="features", labelCol="label"),
        ]
    )
    model = pipe.fit(df)
    preds = model.transform(df)
    n_wrong = preds.filter(F.col("prediction") != F.col("label")).count()
    assert n_wrong == 0


def test_linreg_exact_line(ml):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    # y = 3x + 7 exactly → normal solver recovers it to fp precision
    df = ml.createDataFrame(
        [(float(x), 3.0 * x + 7.0) for x in range(10)], ["x", "y"]
    )
    data = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
    model = LinearRegression(
        featuresCol="features", labelCol="y", solver="normal", regParam=0.0
    ).fit(data)
    assert abs(model.coefficients[0] - 3.0) < 1e-6
    assert abs(model.intercept - 7.0) < 1e-6


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01"], ids=["sf0.001", "sf0.01"]
)
def test_seeded_trainers_fixture_metrics_both_sfs(ml, sf):
    """VERDICT r11 #7: the rows-only seeded trainers' metric
    assertions ran at sf0.001 only — a trainer that silently
    degraded at the driver's correctness scale (sf0.01) had no
    fixture-scale witness. Drive the three cheapest registered
    trainer queries at BOTH SFs and assert their fit quality on the
    fixture itself: LR and NB must beat the majority-class baseline
    of their targets by a real margin (the embeddings/labels and
    embeddings/labels fixture is learnably structured at every SF),
    NB must behave like a correctly-fit prior-dominated classifier
    (the fixture's text deliberately shares ONE vocabulary across
    langs — verified by sampling — so matching the majority prior IS
    the Bayes-optimal answer there, and dropping below it would mean
    a broken pipeline), and the closed-form linreg's residuals must
    average far below the target's own spread (R^2-style sanity
    without pinning floats)."""
    sf_dir = os.path.join(
        os.path.dirname(os.path.normpath(SF_DIR)), sf
    )
    if not os.path.isdir(sf_dir):
        pytest.skip(f"fixture {sf_dir} absent")

    # ml_classify_lr: accuracy over embeddings vs majority baseline
    rows = q("ml_classify_lr")(ml, sf_dir).collect()
    acc = sum(r["label"] == r["predicted"] for r in rows) / len(rows)
    counts: dict[int, int] = {}
    for r in rows:
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    majority = max(counts.values()) / len(rows)
    assert acc > majority + 0.1, (sf, acc, majority)

    # ml_naive_bayes: every doc classified, predictions drawn from
    # the observed label set, and accuracy at least the majority
    # prior (language carries no text signal in this fixture, so
    # the prior is the ceiling; falling below it = broken pipeline)
    docs_n = load_table(ml, sf_dir, "documents").count()
    rows = q("ml_naive_bayes")(ml, sf_dir).collect()
    assert len(rows) == docs_n
    langs = {r["lang"] for r in rows}
    assert {r["predicted_lang"] for r in rows} <= langs
    acc = sum(r["lang"] == r["predicted_lang"] for r in rows) / len(rows)
    counts = {}
    for r in rows:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    majority = max(counts.values()) / len(rows)
    assert acc >= majority - 0.02, (sf, acc, majority)

    # ml_linreg: mean |residual| far below the target's own spread
    rows = q("ml_linreg")(ml, sf_dir).collect()
    n = len(rows)
    mean_chars = sum(r["n_chars"] for r in rows) / n
    mad_baseline = sum(abs(r["n_chars"] - mean_chars) for r in rows) / n
    mad_model = sum(abs(r["residual"]) for r in rows) / n
    assert mad_model < 0.5 * mad_baseline, (sf, mad_model, mad_baseline)


def test_fpgrowth_known_itemsets(ml):
    from pyspark.ml.fpm import FPGrowth

    baskets = ml.createDataFrame(
        [([1, 2],), ([1, 2],), ([1, 2, 3],), ([3],)], ["items"]
    )
    model = FPGrowth(itemsCol="items", minSupport=0.5).fit(baskets)
    got = {
        tuple(sorted(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
    }
    assert got == {(1,): 3, (2,): 3, (1, 2): 3, (3,): 2}


def test_crossval_picks_weaker_regularization(spark, sf_dir):
    # on separable-ish embeddings, reg 0.01 must beat reg 0.5
    rows = {r["reg_param"]: r["avg_accuracy"] for r in
            q("ml_crossval")(spark, sf_dir).collect()}
    assert set(rows) == {0.01, 0.5}
    assert rows[0.01] >= rows[0.5]


def test_svm_linear_beats_chance(spark, sf_dir):
    rows = q("ml_svm_linear")(spark, sf_dir).collect()
    acc = sum(r["label"] == r["predicted"] for r in rows) / len(rows)
    assert acc > 0.6, f"SVM accuracy {acc} no better than chance"


def test_gmm_posteriors_and_k(spark, sf_dir):
    rows = q("ml_cluster_gmm")(spark, sf_dir).collect()
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(4)) and len(clusters) >= 2
    for r in rows:
        assert 0.25 <= r["max_posterior"] <= 1.0  # >= 1/k by definition


def test_bisecting_kmeans_partitions_all(spark, sf_dir):
    rows = q("ml_cluster_bisecting")(spark, sf_dir).collect()
    assert len(rows) == 500
    assert {r["cluster"] for r in rows} <= set(range(5))


def test_lda_topics_valid(spark, sf_dir):
    rows = q("ml_topic_lda")(spark, sf_dir).collect()
    assert len(rows) == 500
    assert {r["top_topic"] for r in rows} <= set(range(4))
    for r in rows:
        assert r["topic_weight"] >= 0.25 - 1e-9  # max of 4 weights >= 1/4


def test_isotonic_prediction_is_monotone(spark, sf_dir):
    rows = q("ml_isotonic")(spark, sf_dir).collect()
    by_qty = sorted(rows, key=lambda r: r["qty"])
    preds = [r["calibrated_price"] for r in by_qty]
    assert all(a <= b + 1e-9 for a, b in zip(preds, preds[1:])), (
        "isotonic fit is not monotone"
    )


def test_pipeline_save_load_roundtrip_identical(spark, sf_dir):
    rows = q("ml_pipeline_save_load")(spark, sf_dir).collect()
    assert rows and all(r["match"] for r in rows), (
        "reloaded pipeline diverged from the fitted one"
    )
