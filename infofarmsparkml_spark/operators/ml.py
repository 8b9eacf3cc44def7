"""ML layer (SURVEY.md §2.11, M1-M10) — the reference's own domain
(Spark-MLlib-era pipelines) rebuilt on DataFrame-based ``pyspark.ml``.

Reference provenance: /root/reference is EMPTY (SURVEY.md §0); this
surface reconstructs the era-typical MLlib demo repo — tokenize /
TF-IDF / sentiment-style text scoring / classification / clustering
/ ALS recommendation / evaluation — per BASELINE.json's "MLlib
pipelines directly". All estimators are seeded (seed=42) and
metrics-tested rather than row-compared where training is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


def _tokens_and_tf(spark: SparkSession, sf_dir: str):
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer

    docs = load_table(spark, sf_dir, "documents")
    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+", toLowercase=True
    )
    toks = tok.transform(docs)
    cv = CountVectorizer(inputCol="toks", outputCol="tf", minDF=1.0)
    model = cv.fit(toks)
    return model.transform(toks)


@query(
    "ml_tokenize_tf",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_terms
FROM tok
""",
)
def ml_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: RegexTokenizer + CountVectorizer term frequencies. The
    TF vector's nnz equals the distinct-token count (minDF=1, no
    vocab cap), which gives the SQL-checkable projection. The oracle
    mirrors RegexTokenizer semantics exactly — lower(), regex \\s+
    split, empty tokens dropped (minTokenLength=1) — so parity does
    not depend on fixture text being single-spaced lowercase."""
    from pyspark.ml.functions import vector_to_array

    tf = _tokens_and_tf(spark, sf_dir)
    arr = vector_to_array(F.col("tf"))
    return tf.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_distinct_terms"),
    )


@query(
    "ml_tfidf",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents),
m AS (SELECT COUNT(*) AS n_docs FROM tok),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM tok)
  GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
w AS (
  SELECT tf.doc_id,
         tf.tf * ln((m.n_docs + 1.0) / (df.df + 1.0)) AS wt
  FROM tf JOIN df USING (token) CROSS JOIN m)
SELECT t.doc_id,
       CAST(COUNT(CASE WHEN w.wt > 0 THEN 1 END) AS INTEGER) AS tfidf_nnz,
       ROUND(SQRT(COALESCE(SUM(w.wt * w.wt), 0)), 4) AS tfidf_l2
FROM tok t LEFT JOIN w ON t.doc_id = w.doc_id
GROUP BY t.doc_id
""",
)
def ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: TF-IDF pipeline (tokenize → CountVectorizer → IDF);
    emits per-doc L2 norm + nnz of the weighted vector. The IDF
    formula is closed-form — ln((m+1)/(df+1)) — so the oracle
    recomputes it relationally (tf × df join); known-answer unit
    test covers the formula besides."""
    from pyspark.ml.feature import IDF
    from pyspark.ml.functions import vector_to_array

    tf = _tokens_and_tf(spark, sf_dir)
    idf = IDF(inputCol="tf", outputCol="tfidf")
    out = idf.fit(tf).transform(tf)
    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x > 0)).alias("tfidf_nnz"),
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("tfidf_l2"),
    )


# Spark's default English stopword list (public resource shipped with
# pyspark: StopWordsRemover.loadDefaultStopWords("english"), 181
# words), inlined so the DuckDB oracle can apply the identical list.
_ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "should", "now", "i'll", "you'll", "he'll",
    "she'll", "we'll", "they'll", "i'd", "you'd", "he'd", "she'd",
    "we'd", "they'd", "i'm", "you're", "he's", "she's", "it's",
    "we're", "they're", "i've", "we've", "you've", "they've", "isn't",
    "aren't", "wasn't", "weren't", "haven't", "hasn't", "hadn't",
    "don't", "doesn't", "didn't", "won't", "wouldn't", "shan't",
    "shouldn't", "mustn't", "can't", "couldn't", "cannot", "could",
    "here's", "how's", "let's", "ought", "that's", "there's", "what's",
    "when's", "where's", "who's", "why's", "would",
]

_STOPWORDS_SQL_LIST = "[" + ", ".join(
    "'" + w.replace("'", "''") + "'" for w in _ENGLISH_STOPWORDS
) + "]"


@query(
    "ml_ngram_stopwords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents),
content AS (
  SELECT doc_id,
         list_filter(toks,
                     t -> NOT list_contains({_STOPWORDS_SQL_LIST}, t))
           AS ctoks
  FROM tok)
SELECT doc_id,
       CAST(len(ctoks) AS INTEGER) AS n_content_tokens,
       CAST(GREATEST(len(ctoks) - 1, 0) AS INTEGER) AS n_bigrams,
       CASE WHEN len(ctoks) >= 2 THEN ctoks[1] || ' ' || ctoks[2] END
         AS first_bigram
FROM content
""",
)
def ml_ngram_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: StopWordsRemover (default English list, inlined above for
    the oracle twin) + bigram NGram."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import NGram, RegexTokenizer, StopWordsRemover

    docs = load_table(spark, sf_dir, "documents")
    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="toks", pattern=r"\s+"),
            StopWordsRemover(inputCol="toks", outputCol="content_toks"),
            NGram(n=2, inputCol="content_toks", outputCol="bigrams"),
        ]
    )
    out = pipe.fit(docs).transform(docs)
    return out.select(
        "doc_id",
        F.size("content_toks").alias("n_content_tokens"),
        F.size("bigrams").alias("n_bigrams"),
        F.element_at(F.col("bigrams"), 1).alias("first_bigram"),
    )


@query(
    "ml_word_count",
    oracle="""
SELECT lang, token, COUNT(*) AS cnt
FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY lang, token
""",
)
def ml_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: classic word count per language — explode + two-key agg
    (map-side partial keeps the shuffle at vocab×langs rows)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SENTIMENT_LEXICON = [
    ("fast", 1),
    ("slow", -1),
    ("big", 1),
    ("small", -1),
    ("dup", -2),
    ("spark", 2),
]


@query(
    "ml_sentiment_lexicon",
    oracle="""
WITH lex(word, score) AS (VALUES
  ('fast', 1), ('slow', -1), ('big', 1), ('small', -1),
  ('dup', -2), ('spark', 2)),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
SELECT t.doc_id,
       CAST(COALESCE(SUM(l.score), 0) AS BIGINT) AS sentiment,
       CAST(COUNT(l.word) AS BIGINT) AS n_scored
FROM tok t LEFT JOIN lex l ON t.token = l.word
GROUP BY t.doc_id
""",
)
def ml_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: lexicon-based sentiment (the reference-domain Twitter-
    sentiment pattern, PAPERS.md:5) — tokens broadcast-joined
    against a tiny lexicon, summed per doc. At 100 TB the lexicon
    side is always broadcast; the token explosion never shuffles
    until the per-doc re-aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    lex = F.broadcast(
        spark.createDataFrame(SENTIMENT_LEXICON, ["word", "score"])
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        tok.join(lex, tok.token == lex.word, "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum("score"), F.lit(0)).cast("long").alias("sentiment"),
            F.count("word").alias("n_scored"),
        )
    )


def _embedding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


@query("ml_classify_lr")  # iterative training: rows-only + metric tests
def ml_classify_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: multinomial logistic regression embeddings→label
    (DataFrame-native successor of MLlib LogisticRegressionWithLBFGS)."""
    from pyspark.ml.classification import LogisticRegression

    data = _embedding_features(spark, sf_dir)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=15, regParam=0.01
    )
    model = lr.fit(data)
    return model.transform(data).select(
        "vec_id", "label", F.col("prediction").cast("int").alias("predicted")
    )


@query("ml_cluster_kmeans")  # seeded but engine-specific: rows-only
def ml_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: k-means over embeddings (k=5, seed=42)."""
    from pyspark.ml.clustering import KMeans

    data = _embedding_features(spark, sf_dir)
    km = KMeans(featuresCol="features", k=5, seed=42, maxIter=20)
    return (
        km.fit(data)
        .transform(data)
        .select("vec_id", F.col("prediction").alias("cluster"))
    )


@query("ml_recommend_als")  # seeded iterative factorization: rows-only
def ml_recommend_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: ALS collaborative filtering on (user, item, rating)
    triples derived from events (item = props.k, rating = value);
    emits top-3 recommendations per user."""
    from pyspark.ml.recommendation import ALS

    ev = load_table(spark, sf_dir, "events")
    ratings = ev.select(
        F.col("user_id").cast("int").alias("user"),
        F.get_json_object("props", "$.k").cast("int").alias("item"),
        F.col("value").cast("float").alias("rating"),
    ).where(F.col("item").isNotNull())
    als = ALS(
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        rank=8,
        maxIter=8,
        seed=42,
        coldStartStrategy="drop",
        # block counts should track cluster parallelism, not the 10×10
        # default: every ALS iteration shuffles user/item blocks and
        # recommendForAllUsers cross-joins them (blocks² tasks)
        numUserBlocks=8,
        numItemBlocks=8,
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user").alias("user_id"),
        F.explode("recommendations").alias("rec"),
    ).select(
        "user_id",
        F.col("rec.item").alias("item"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


@query(
    "ml_eval",
    oracle="""
WITH s AS (
  SELECT vec_id,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
         list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b) AS z
  FROM embeddings
),
p AS (
  SELECT vec_id, y, z,
         CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred,
         ROW_NUMBER() OVER (ORDER BY z, vec_id) AS rn
  FROM s
),
a AS (
  SELECT COUNT(*) AS n,
         SUM(y) AS n1,
         SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS n_correct,
         SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS fneg,
         SUM(CASE WHEN y = 1 THEN rn ELSE 0 END) AS rank_sum_pos
  FROM p
),
m AS (
  SELECT CAST(n_correct AS DOUBLE) / n AS acc,
         CAST(tp AS DOUBLE) / (tp + fp) AS prec_v,
         CAST(tp AS DOUBLE) / (tp + fneg) AS rec_v,
         (CAST(rank_sum_pos AS DOUBLE) - n1 * (n1 + 1) / 2.0)
           / (n1 * (n - n1)) AS auc_v
  FROM a
)
SELECT ROUND(acc, 6) AS accuracy,
       ROUND(prec_v, 6) AS prec,
       ROUND(rec_v, 6) AS recall,
       ROUND(CASE WHEN prec_v + rec_v = 0 THEN 0.0
                  ELSE 2 * prec_v * rec_v / (prec_v + rec_v) END, 6) AS f1,
       ROUND(auc_v, 6) AS auc
FROM m
""",
)
def ml_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: evaluation metrics — accuracy / precision / recall / F1 /
    ROC-AUC for a binary classifier, computed with exact count and
    rank arithmetic so a closed-form SQL oracle exists (the r3
    verdict's ask: AUC in Mann-Whitney rank form).

    The classifier under evaluation is DETERMINISTIC (score z =
    left-fold sum of the embedding; predict 1 iff z >= 0; target
    y = label >= 5) — trained-model metrics are seed/solver bound
    and stay in the rows-only ML queries, but the METRIC math here
    is exactly what MLlib's evaluators compute (asserted equal to
    MulticlassClassificationEvaluator in tests/test_ml.py).

    Scale shape: AUC needs a global rank over scores — stamped by
    ``global_row_number`` (range partition + monotonic-id in-partition ranks +
    broadcast offsets), never a SinglePartition window; everything
    else is one partial+final aggregate. Both engines fold z in
    index order → doubles bit-identical; all metric divisions share
    one formula tree, so ROUND(·, 6) agrees."""
    from infofarmsparkml_spark.operators.sorts import global_row_number

    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        (F.col("label") >= 5).cast("int").alias("y"),
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z"),
    ).withColumn("pred", (F.col("z") >= 0).cast("int"))
    ranked = global_row_number(
        scored, [F.col("z").asc(), F.col("vec_id")], "rn"
    )
    a = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n1"),
        F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0)).alias(
            "n_correct"
        ),
        F.sum(
            F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("fneg"),
        F.sum(
            F.when(F.col("y") == 1, F.col("rn")).otherwise(F.lit(0))
        ).alias("rank_sum_pos"),
    )
    prec_v = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec_v = F.col("tp").cast("double") / (F.col("tp") + F.col("fneg"))
    auc_v = (
        F.col("rank_sum_pos").cast("double")
        - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    ) / (F.col("n1") * (F.col("n") - F.col("n1")))
    return a.select(
        F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
            "accuracy"
        ),
        F.round(prec_v, 6).alias("prec"),
        F.round(rec_v, 6).alias("recall"),
        F.round(
            F.when(prec_v + rec_v == 0, F.lit(0.0)).otherwise(
                F.lit(2) * prec_v * rec_v / (prec_v + rec_v)
            ),
            6,
        ).alias("f1"),
        F.round(auc_v, 6).alias("auc"),
    )


@query("ml_eval_trained")  # seeded LR/k-means metrics: rows-only
def ml_eval_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9b: the trained-model metric row (LR accuracy/F1, k-means
    silhouette via MLlib evaluators) — solver/seed-bound, so
    rows-only; the metric ARITHMETIC is hash-proven by ml_eval."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import (
        ClusteringEvaluator,
        MulticlassClassificationEvaluator,
    )

    data = _embedding_features(spark, sf_dir).cache()
    lr_pred = (
        LogisticRegression(
            featuresCol="features", labelCol="label", maxIter=15, regParam=0.01
        )
        .fit(data)
        .transform(data)
    )
    acc = MulticlassClassificationEvaluator(
        labelCol="label", metricName="accuracy"
    ).evaluate(lr_pred)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", metricName="f1"
    ).evaluate(lr_pred)
    km_pred = KMeans(featuresCol="features", k=5, seed=42).fit(data).transform(data)
    sil = ClusteringEvaluator(featuresCol="features").evaluate(km_pred)
    data.unpersist()
    return spark.createDataFrame(
        [(round(acc, 4), round(f1, 4), round(sil, 4))],
        ["lr_accuracy", "lr_f1", "kmeans_silhouette"],
    )


@query(
    "ml_scaler_pca",
    oracle="""
WITH u AS (
  SELECT vec_id,
         UNNEST(CAST(embedding AS DOUBLE[])) AS x,
         GENERATE_SUBSCRIPTS(embedding, 1) AS i
  FROM embeddings
),
stats AS (
  SELECT i, AVG(x) AS m, STDDEV_SAMP(x) AS s FROM u GROUP BY i
),
z AS (
  SELECT u.vec_id, (u.x - stats.m) / stats.s AS zx
  FROM u JOIN stats USING (i)
)
SELECT vec_id, ROUND(SQRT(SUM(zx * zx)), 4) AS pc_norm
FROM z GROUP BY vec_id
""",
)
def ml_scaler_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: StandardScaler (with mean/std) → full-rank PCA; emits
    the projected-vector L2 norm.

    SQL-oracled (the r3 verdict's ask): with k = the full feature
    dimension, the principal components form a complete orthonormal
    basis, so the PCA projection is a pure rotation of the
    (centered) scaled vector and ‖pc‖₂ ≡ ‖scaled‖₂ — which IS
    closed-form: sqrt(Σ_d ((x_d − mean_d)/stddev_d)²), expressed in
    DuckDB over the unnested embeddings. This pins BOTH MLlib
    stages numerically (scaler mean/std against AVG/STDDEV_SAMP,
    PCA orthonormality via norm preservation) to 4 decimals;
    truncated-PCA variance capture is asserted separately in
    tests/test_ml.py.

    Scale shape: scaler fit and covariance are one treeAggregate
    each; the 64×64 eigendecomposition is O(dim³) on the driver,
    independent of row count."""
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import vector_to_array

    data = _embedding_features(spark, sf_dir)
    dim = data.select(
        F.size(vector_to_array("features")).alias("d")
    ).first()["d"]
    scaler = StandardScaler(
        inputCol="features", outputCol="scaled", withMean=True, withStd=True
    )
    scaled = scaler.fit(data).transform(data)
    pca = PCA(k=dim, inputCol="scaled", outputCol="pc")
    out = pca.fit(scaled).transform(scaled)
    arr = vector_to_array(F.col("pc"))
    return out.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("pc_norm"),
    )


@query("ml_decision_tree")  # greedy split search on binned stats: rows-only
def ml_decision_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: decision-tree classification embeddings→label — the
    era's second classic classifier (MLlib DecisionTree.trainClassifier).
    Training aggregates per-feature histogram stats per node: one
    distributed pass per tree level, no per-row driver work."""
    from pyspark.ml.classification import DecisionTreeClassifier

    data = _embedding_features(spark, sf_dir)
    dt = DecisionTreeClassifier(
        featuresCol="features", labelCol="label", maxDepth=5, seed=42
    )
    return (
        dt.fit(data)
        .transform(data)
        .select("vec_id", "label", F.col("prediction").cast("int").alias("predicted"))
    )


@query("ml_random_forest")  # seeded bagging ensemble: rows-only
def ml_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: random-forest ensemble (20 trees, seeded bootstrap).
    Trees train over shared per-partition histogram aggregates, so
    cost grows with trees×levels, not trees×rows — the distributed
    ensemble shape that holds at scale."""
    from pyspark.ml.classification import RandomForestClassifier

    data = _embedding_features(spark, sf_dir)
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="label", numTrees=20, maxDepth=5, seed=42
    )
    return (
        rf.fit(data)
        .transform(data)
        .select("vec_id", "label", F.col("prediction").cast("int").alias("predicted"))
    )


@query("ml_naive_bayes")  # corpus-fit priors/likelihoods: rows-only
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13: multinomial naive Bayes over hashed term frequencies,
    predicting each document's language — the era's canonical text
    classifier (and the sentiment-paper model, PAPERS.md:5). The
    whole pipeline (tokenize → HashingTF → NB) is two distributed
    passes: one to aggregate per-class term counts, one to score."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import HashingTF, IndexToString, StringIndexer, Tokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            HashingTF(inputCol="words", outputCol="features", numFeatures=1 << 14),
            StringIndexer(inputCol="lang", outputCol="label"),
            NaiveBayes(featuresCol="features", labelCol="label", smoothing=1.0),
        ]
    )
    model = pipe.fit(docs)
    labels = model.stages[2].labelsArray[0]
    out = model.transform(docs)
    back = IndexToString(
        inputCol="prediction", outputCol="predicted_lang", labels=list(labels)
    )
    return back.transform(out).select("doc_id", "lang", "predicted_lang")


@query(
    "ml_linreg",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) AS y,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS x1,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS x2
  FROM documents),
s AS (
  SELECT covar_pop(x1, x1) AS s11, covar_pop(x1, x2) AS s12,
         covar_pop(x2, x2) AS s22,
         covar_pop(x1, y) AS sy1, covar_pop(x2, y) AS sy2,
         avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my
  FROM f),
b AS (
  SELECT (s22 * sy1 - s12 * sy2) / (s11 * s22 - s12 * s12) AS b1,
         (s11 * sy2 - s12 * sy1) / (s11 * s22 - s12 * s12) AS b2,
         m1, m2, my
  FROM s)
SELECT f.doc_id,
       CAST(f.y AS BIGINT) AS n_chars,
       ROUND(b.my + b.b1 * (f.x1 - b.m1) + b.b2 * (f.x2 - b.m2), 2)
         AS predicted_chars,
       ROUND(f.y - (b.my + b.b1 * (f.x1 - b.m1) + b.b2 * (f.x2 - b.m2)), 2)
         AS residual
FROM f CROSS JOIN b
""",
)
def ml_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14: linear regression (normal-equation solver — one
    distributed Gramian aggregation, deterministic closed form)
    fitting n_chars from whitespace/BPE-ish token counts; emits
    per-doc prediction and residual. OLS on 2 features + intercept
    is closed-form, so the oracle solves the same normal equations
    via covariance algebra (Cramer on the centered 2×2 system)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("y"),
        F.size(F.split(F.col("text"), " ")).cast("double").alias("n_ws"),
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("double")
        .alias("n_uniq"),
    )
    va = VectorAssembler(inputCols=["n_ws", "n_uniq"], outputCol="features")
    lr = LinearRegression(
        featuresCol="features", labelCol="y", solver="normal", regParam=0.0
    )
    data = va.transform(feats)
    pred = lr.fit(data).transform(data)
    return pred.select(
        "doc_id",
        F.col("y").cast("long").alias("n_chars"),
        F.round("prediction", 2).alias("predicted_chars"),
        F.round(F.col("y") - F.col("prediction"), 2).alias("residual"),
    )


@query(
    "ml_fpgrowth",
    oracle="""
WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 50 AS it
            FROM lineitem),
mc AS (SELECT CAST(CEIL(0.005 * COUNT(DISTINCT o)) AS BIGINT) AS minc
       FROM bi),
s1 AS (SELECT CAST(it AS VARCHAR) AS itemset, COUNT(*) AS c
       FROM bi GROUP BY it),
s2 AS (SELECT CAST(a.it AS VARCHAR) || ',' || CAST(b.it AS VARCHAR)
              AS itemset, COUNT(*) AS c
       FROM bi a JOIN bi b ON a.o = b.o AND a.it < b.it
       GROUP BY a.it, b.it),
s3 AS (SELECT CAST(a.it AS VARCHAR) || ',' || CAST(b.it AS VARCHAR)
              || ',' || CAST(c3.it AS VARCHAR) AS itemset, COUNT(*) AS c
       FROM bi a JOIN bi b ON a.o = b.o AND a.it < b.it
       JOIN bi c3 ON b.o = c3.o AND b.it < c3.it
       GROUP BY a.it, b.it, c3.it)
SELECT itemset, CAST(c AS BIGINT) AS n_orders
FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
      UNION ALL SELECT * FROM s3)
WHERE c >= (SELECT minc FROM mc)
""",
)
def ml_fpgrowth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15: FP-Growth frequent itemsets over per-order part baskets
    (market-basket analysis, the classic MLlib association demo).
    Baskets build with one groupBy; mining distributes by suffix
    partitioning of the FP-tree. Itemsets are sorted into a stable
    string key so output is deterministic.

    SQL-oracled (graduated rows-only -> hash in r13, VERDICT r12
    #4): with a fixed relative support, frequent-itemset supports
    are deterministic exact basket counts — MLlib's threshold is
    ``ceil(minSupport * n_baskets)`` (public Spark
    mllib/fpm/FPGrowth.scala), which DuckDB reproduces with the same
    double CEIL. The oracle enumerates candidate itemsets by
    self-joining the distinct (order, item) table at sizes 1-3 and
    keeps those meeting the threshold — exactly the frequent-pattern
    definition, feasible because the oracle only needs the FIXTURE's
    shallow itemsets (minSupport 0.005 over ~3.9-item baskets of 50
    distinct items yields all 50 singletons, 807-1225 pairs, zero
    triples at sf0.001/0.01/0.1; the size-3 level is unrolled so
    near-threshold drift is still covered). A runtime guard raises
    if the model ever emits an itemset larger than the oracle's
    unroll depth instead of silently hash-mismatching — the same
    depth-contract pattern as `graph_kcore`'s peel oracle."""
    from pyspark.ml.fpm import FPGrowth

    lf = load_table(spark, sf_dir, "lineitem")
    baskets = lf.groupBy("l_orderkey").agg(
        F.array_distinct(F.collect_list(F.col("l_partkey") % 50)).alias("items")
    )
    fp = FPGrowth(itemsCol="items", minSupport=0.005, minConfidence=0.2)
    model = fp.fit(baskets)
    # localCheckpoint: freqItemsets is NOT persisted by the fit, so
    # the depth-guard action below and the caller's collect would
    # each re-run the whole mining (the dominant cost at minSupport
    # 0.005) — observed as a 2x on this query's profile time.
    fi = model.freqItemsets.localCheckpoint()
    max_k = fi.agg(F.max(F.size("items"))).first()[0]
    if max_k is not None and max_k > 3:
        raise ValueError(
            f"ml_fpgrowth found a size-{max_k} frequent itemset; the "
            "SQL oracle unrolls candidate enumeration to size 3 — "
            "extend the s4+ levels before trusting parity"
        )
    return fi.select(
        F.concat_ws(",", F.array_sort(F.col("items"))).alias("itemset"),
        F.col("freq").alias("n_orders"),
    )


@query("ml_word2vec")  # SGD embedding training: rows-only
def ml_word2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16: Word2Vec skip-gram embeddings over the corpus tokens
    (numPartitions=1 + fixed seed keeps training deterministic);
    emits each vocabulary word's vector norm — a rotation-stable
    view of the learned geometry."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.split(F.col("text"), " ").alias("words"))
    w2v = Word2Vec(
        inputCol="words",
        outputCol="vec",
        vectorSize=16,
        minCount=5,
        seed=42,
        numPartitions=1,
        maxIter=1,
    )
    model = w2v.fit(words)
    arr = vector_to_array(F.col("vector"))
    return model.getVectors().select(
        "word",
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("vec_norm"),
    )


@query("ml_crossval")  # k-fold model selection: rows-only
def ml_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M17: 3-fold cross-validated model selection over an LR
    regularization grid — the `pyspark.ml.tuning` surface. Folds
    split by a seeded hash, so the selection is reproducible; each
    (fold × param) fit is an independent Spark job, parallelizable
    across the cluster via `parallelism`."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    data = _embedding_features(spark, sf_dir)
    lr = LogisticRegression(featuresCol="features", labelCol="label", maxIter=15)
    grid = (
        ParamGridBuilder().addGrid(lr.regParam, [0.01, 0.5]).build()
    )
    ev = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=ev,
        numFolds=3,
        seed=42,
        parallelism=4,
    )
    model = cv.fit(data)
    rows = [
        (float(pm[lr.regParam]), round(float(m), 4))
        for pm, m in zip(grid, model.avgMetrics)
    ]
    return spark.createDataFrame(rows, "reg_param double, avg_accuracy double")


@query("ml_gbt")  # boosted-stage training: rows-only
def ml_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M18: gradient-boosted trees (binary: label >= 3), the
    strongest of the tree family. Each boosting stage is a full
    distributed tree fit on the previous stage's residuals —
    sequential in stages, parallel within each; 10 stages × depth 3
    keeps bench cost bounded."""
    from pyspark.ml.classification import GBTClassifier

    data = _embedding_features(spark, sf_dir).withColumn(
        "bin_label", (F.col("label") >= 3).cast("int")
    )
    gbt = GBTClassifier(
        featuresCol="features", labelCol="bin_label",
        maxIter=10, maxDepth=3, seed=42,
    )
    return (
        gbt.fit(data)
        .transform(data)
        .select(
            "vec_id", "bin_label",
            F.col("prediction").cast("int").alias("predicted"),
        )
    )


@query("ml_svm_linear")  # hinge-loss iterative training: rows-only
def ml_svm_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear SVM (hinge loss) on embeddings, label binarized to
    {0,1} on label>=5 — the pyspark.ml successor of MLlib's
    SVMWithSGD, an era-staple binary classifier. Training is the
    usual distributed gradient aggregation (treeAggregate per
    iteration); scoring is a map-only projection."""
    from pyspark.ml.classification import LinearSVC

    data = _embedding_features(spark, sf_dir).withColumn(
        "bin_label", (F.col("label") >= 5).cast("double")
    )
    svc = LinearSVC(
        featuresCol="features", labelCol="bin_label", maxIter=20, regParam=0.05
    )
    model = svc.fit(data)
    return model.transform(data).select(
        "vec_id",
        F.col("bin_label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("predicted"),
    )


@query("ml_cluster_gmm")  # EM with random init: rows-only (seeded)
def ml_cluster_gmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian mixture (k=4, seed=42) over embeddings — soft
    clustering via distributed EM; each iteration is one aggregate
    of per-point responsibilities. Fitting runs on an 8-dim PCA
    projection: a full 64×64 covariance per component is both
    statistically underdetermined at modest cluster sizes and
    numerically fragile (breeze's eigSym rejects the
    near-asymmetric matrix), while PCA→GMM is the standard
    dimensionality-then-density pipeline. Emits the hard assignment
    plus the max posterior, rounded for stability."""
    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array

    data = _embedding_features(spark, sf_dir)
    pca = PCA(k=8, inputCol="features", outputCol="pca8")
    proj = pca.fit(data).transform(data)
    gmm = GaussianMixture(featuresCol="pca8", k=4, seed=42, maxIter=25)
    out = gmm.fit(proj).transform(proj)
    return out.select(
        "vec_id",
        F.col("prediction").alias("cluster"),
        F.round(F.array_max(vector_to_array(F.col("probability"))), 2).alias(
            "max_posterior"
        ),
    )


@query("ml_cluster_bisecting")  # divisive hierarchy, seeded: rows-only
def ml_cluster_bisecting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bisecting k-means (k=5, seed=42): top-down divisive
    clustering — repeatedly splits the largest cluster with a local
    2-means. Hierarchical structure at scale without all-pairs
    linkage (agglomerative is O(n²); this stays O(n·k·iter))."""
    from pyspark.ml.clustering import BisectingKMeans

    data = _embedding_features(spark, sf_dir)
    bkm = BisectingKMeans(featuresCol="features", k=5, seed=42, maxIter=20)
    return (
        bkm.fit(data)
        .transform(data)
        .select("vec_id", F.col("prediction").alias("cluster"))
    )


@query("ml_topic_lda")  # variational EM, seeded: rows-only
def ml_topic_lda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDA topic model (k=4 topics, seed=42) over the CountVectorizer
    term-frequency vectors — the classic MLlib-era corpus-exploration
    workload. Online variational inference processes the corpus in
    mini-batches (each a distributed aggregate); emits each doc's
    dominant topic and its weight."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.functions import vector_to_array

    tf = _tokens_and_tf(spark, sf_dir)
    lda = LDA(featuresCol="tf", k=4, seed=42, maxIter=15)
    out = lda.fit(tf).transform(tf)
    witharr = out.withColumn(
        "ta", vector_to_array(F.col("topicDistribution"))
    )
    return witharr.select(
        "doc_id",
        (F.expr("array_position(ta, array_max(ta))") - 1)
        .cast("int")
        .alias("top_topic"),
        F.round(F.array_max(F.col("ta")), 2).alias("topic_weight"),
    )


@query(
    "ml_isotonic",
    oracle=None,  # PAV pool boundaries are solver-defined: rows-only
)
def ml_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of l_extendedprice on l_quantity —
    monotone calibration (the pool-adjacent-violators shape used to
    calibrate model scores into probabilities). MLlib parallelizes
    PAV per partition then merges pools on the driver; predictions
    are piecewise-linear, monotone by construction (unit-tested)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    lf = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    va = VectorAssembler(inputCols=["qty"], outputCol="features")
    data = va.transform(lf)
    iso = IsotonicRegression(
        featuresCol="features", labelCol="price", isotonic=True
    )
    model = iso.fit(data)
    return model.transform(data).select(
        "l_orderkey",
        "l_linenumber",
        "qty",
        F.round(F.col("prediction"), 4).alias("calibrated_price"),
    )


@query("ml_pipeline_save_load")  # persistence round trip: rows-only
def ml_pipeline_save_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline persistence — the deploy path of every MLlib-era
    project: fit a Tokenizer→CountVectorizer→IDF→LogisticRegression
    pipeline, save it with MLWriter, reload with PipelineModel.load,
    and score with the RELOADED model. The returned frame carries
    predictions from both the in-memory and reloaded models plus a
    match flag, so any serialization drift (vocabulary order, coef
    precision) shows up as rows with match=false — asserted all-true
    in unit tests. Model files are driver-side metadata + small
    parquet (coefficients), so persistence cost is independent of
    training-data scale."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer

    from infofarmsparkml_spark.operators._util import scratch_dir

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "label", (F.col("doc_id") % 2).cast("double")
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text", outputCol="toks", pattern=r"\s+",
                toLowercase=True,
            ),
            # vocabSize bounds the feature dimension: unbounded vocab
            # (the 2^18 default) makes the LR stage's weight vector —
            # and every treeAggregate gradient — grow with corpus
            # vocabulary, which is a scale bug at 100 TB. 4096 keeps
            # the model broadcast-small at any SF.
            CountVectorizer(
                inputCol="toks", outputCol="tf", minDF=1.0, vocabSize=4096
            ),
            IDF(inputCol="tf", outputCol="features"),
            LogisticRegression(
                featuresCol="features", labelCol="label", maxIter=10,
                regParam=0.1,
            ),
        ]
    )
    model = pipe.fit(docs)
    path = scratch_dir("ml_pipeline_model", sf_dir)
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    orig = model.transform(docs).select(
        "doc_id", F.col("prediction").alias("pred_orig")
    )
    re = reloaded.transform(docs).select(
        "doc_id", F.col("prediction").alias("pred_reloaded")
    )
    return orig.join(re, "doc_id").select(
        "doc_id",
        F.col("pred_orig").cast("int").alias("pred_orig"),
        F.col("pred_reloaded").cast("int").alias("pred_reloaded"),
        (F.col("pred_orig") == F.col("pred_reloaded")).alias("match"),
    )
