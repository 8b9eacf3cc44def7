"""infofarmsparkml_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) providing the query and
data-processing capabilities of wannesrosiers/InfoFarmSparkML —
a Spark-MLlib-era ML project — rebuilt idiomatically on Spark 4.x:

- relational core on the DataFrame/Catalyst API (scans, filters,
  joins, aggregations, windows, sorts, set ops, scalar functions)
- ``pyspark.ml`` pipelines for the reference's ML domain
  (tokenize, TF-IDF, sentiment-style text scoring, classification,
  clustering, ALS recommendation)
- Structured Streaming for event-time windowing + stateful ops
- an LLM-data-pipeline layer (exact and MinHash-LSH dedup, top-k
  vector similarity, multimodal text+embedding columns, text
  quality analysis) designed for 100 TB-scale operation.

Provenance: the reference checkout at /root/reference was EMPTY at
survey time (SURVEY.md §0), so no reference file:line citations are
possible; the capability surface is reconstructed from the driver
contract (BASELINE.json) and public knowledge about Spark-1.x-era
MLlib demo repos. Every operator is declared via the registry in
:mod:`infofarmsparkml_spark.registry` so the driver contract in
``__spark_entry__.py`` stays a thin shim.
"""

from infofarmsparkml_spark.registry import queries, oracle_sql  # noqa: F401

__version__ = "0.1.0"
