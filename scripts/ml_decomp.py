#!/usr/bin/env python
"""VERDICT r16 #7: decompose ml_pipeline_save_load and ml_topic_lda
wall time into stages, so the expensive remainder is attributable
(MLlib-internal iteration vs avoidable re-reads). Writes
ML_DECOMP_r17.json at the repo root.

Usage: python scripts/ml_decomp.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from infofarmsparkml_spark.operators._util import load_table, scratch_dir
    from infofarmsparkml_spark.operators.ml import _tokens_and_tf
    from infofarmsparkml_spark.session import get_spark

    spark = get_spark("ml-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {"sf_dir": sf_dir}

    def t(label, fn, bucket):
        t0 = time.perf_counter()
        r = fn()
        bucket[label] = round(time.perf_counter() - t0, 2)
        print(f"# {label}: {bucket[label]}s", flush=True)
        return r

    # ---- ml_pipeline_save_load ----
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer

    b: dict = {}
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "label", (F.col("doc_id") % 2).cast("double")
    )
    tokenizer = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+", toLowercase=True
    )
    toks = tokenizer.transform(docs)
    cv = CountVectorizer(
        inputCol="toks", outputCol="tf", minDF=1.0, vocabSize=4096
    )
    cvm = t("cv_fit", lambda: cv.fit(toks), b)
    tf = cvm.transform(toks)
    idf = IDF(inputCol="tf", outputCol="features")
    idfm = t("idf_fit", lambda: idf.fit(tf), b)
    feats = idfm.transform(tf)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=10, regParam=0.1
    )
    lrm = t("lr_fit", lambda: lr.fit(feats), b)
    pipe_model = t(
        "pipeline_fit_full",
        lambda: Pipeline(stages=[tokenizer, cv, idf, lr]).fit(docs),
        b,
    )
    path = scratch_dir("ml_pipeline_model_decomp", sf_dir)
    t("model_save", lambda: pipe_model.write().overwrite().save(path), b)
    reloaded = t("model_load", lambda: PipelineModel.load(path), b)
    t(
        "transform_both_join_noop",
        lambda: pipe_model.transform(docs)
        .select("doc_id", F.col("prediction").alias("pred_orig"))
        .join(
            reloaded.transform(docs).select(
                "doc_id", F.col("prediction").alias("pred_reloaded")
            ),
            "doc_id",
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
        b,
    )
    out["ml_pipeline_save_load"] = b

    # ---- ml_topic_lda ----
    from pyspark.ml.clustering import LDA

    b2: dict = {}
    tf2 = t(
        "tokens_and_tf_build",
        lambda: _tokens_and_tf(spark, sf_dir),
        b2,
    )
    t("tf_noop", lambda: tf2.write.format("noop").mode("overwrite").save(), b2)
    lda = LDA(featuresCol="tf", k=4, seed=42, maxIter=15)
    ldam = t("lda_fit_15iter", lambda: lda.fit(tf2), b2)
    t(
        "lda_transform_noop",
        lambda: ldam.transform(tf2)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        b2,
    )
    out["ml_topic_lda"] = b2
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ML_DECOMP_r17.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
