"""Python DataSource API (Spark 4) — a custom partitioned batch
source registered through ``spark.dataSource.register``.

This is the Spark-4-native answer to the "custom connector" need:
wrap any internal storage/generator system as a first-class source
whose ``partitions()`` drives executor parallelism (each
InputPartition is read by one task, exactly like a parquet split).
The demo source generates a deterministic integer keyspace with an
md5-derived weight — deterministic generation is what makes a
*source* SQL-oracle-checkable: DuckDB rebuilds the identical rows
from ``range()`` + ``md5()`` (hex md5 is bit-identical across
hashlib / Spark / DuckDB, the engine-portable hash family this repo
standardizes on).

At 100 TB the pattern matters because partition planning happens on
the driver from metadata only (no data touched), and each partition
generates/reads its shard independently — the same contract a real
JDBC-shard or object-store connector would implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from infofarmsparkml_spark.registry import query


class _RangeShard(InputPartition):
    """One contiguous id shard; must stay picklable (shipped to
    executors as the task's read spec)."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthRowsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 4096))
        self.nparts = int(options.get("partitions", 8))

    def partitions(self):  # driver-side: metadata only, no data
        step = -(-self.n // self.nparts)
        return [
            _RangeShard(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangeShard):
        # executor-side: generate ONLY this shard
        import hashlib

        for i in range(partition.start, partition.end):
            w = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            yield (i, i % 16, w)


class SynthRowsDataSource(DataSource):
    """``spark.read.format("ifsml_synthrows")`` — options: n, partitions."""

    @classmethod
    def name(cls) -> str:
        return "ifsml_synthrows"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, weight BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _SynthRowsReader(self.options)


def _register_synth_source(spark: SparkSession) -> None:
    """Idempotent per-session registration (register() replaces)."""
    spark.dataSource.register(SynthRowsDataSource)


@query(
    "scan_python_datasource",
    oracle="""
WITH t AS (
  SELECT CAST(range AS BIGINT) AS id,
         CAST(('0x' || substring(md5(CAST(range AS VARCHAR)), 1, 8))
              AS BIGINT) AS weight
  FROM range(0, 4096))
SELECT CAST(id % 16 AS INTEGER) AS bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(weight) AS BIGINT) AS sum_weight,
       MIN(id) AS min_id,
       MAX(id) AS max_id
FROM t
GROUP BY bucket
""",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource scan (Spark 4 ``pyspark.sql.
    datasource``): an 8-shard deterministic source read as a normal
    DataFrame, then aggregated per bucket. The source's
    ``partitions()`` contract is what scales — 8 InputPartitions →
    8 parallel read tasks (asserted in tests), each generating only
    its own id range, exactly how a production connector shards a
    remote system. Values are closed-form (id, id % 16, first 8 md5
    hex digits as int), so DuckDB reconstructs the full source from
    ``range()`` and the result is hash-checked like any table scan.
    ``sf_dir`` is unused: the source IS the data (fixed n=4096)."""
    _register_synth_source(spark)
    src = (
        spark.read.format("ifsml_synthrows")
        .option("n", "4096")
        .option("partitions", "8")
        .load()
    )
    return src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("weight").alias("sum_weight"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


def _md5_weight(i: int) -> int:
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked incremental reads: ``read(start)`` returns one
    chunk and the next offset; ``readBetweenOffsets`` replays a
    committed range verbatim on recovery — the two halves of the
    exactly-once contract a real queue connector implements."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 400))
        self.chunk = int(options.get("chunk", 200))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.chunk, self.n)
        return (
            iter([(i, _md5_weight(i)) for i in range(lo, hi)]),
            {"pos": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [(i, _md5_weight(i)) for i in range(start["pos"], end["pos"])]
        )


class SynthStreamDataSource(DataSource):
    """``spark.readStream.format("ifsml_synthstream")`` — options: n, chunk."""

    @classmethod
    def name(cls) -> str:
        return "ifsml_synthstream"

    def schema(self) -> str:
        return "id BIGINT, weight BIGINT"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)


@query(
    "stream_python_datasource",
    oracle="""
WITH t AS (
  SELECT CAST(range AS BIGINT) AS id,
         CAST(('0x' || substring(md5(CAST(range AS VARCHAR)), 1, 8))
              AS BIGINT) AS weight
  FROM range(0, 400))
SELECT CAST(id % 8 AS INTEGER) AS bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(weight) AS BIGINT) AS sum_weight
FROM t
GROUP BY bucket
""",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python *streaming* DataSource (Spark 4
    ``SimpleDataSourceStreamReader``): a 400-row keyspace arrives in
    200-row offset-tracked chunks (2 micro-batches), aggregated with
    a complete-mode groupBy into a memory sink. Offsets live in the
    query checkpoint; a chunk is only re-read via
    ``readBetweenOffsets`` (committed-range replay), so the sink sees
    each id exactly once — asserted by the closed-form oracle, which
    rebuilds the identical keyspace in DuckDB and hash-compares the
    per-bucket totals. ``availableNow`` captures only the offset
    visible at start for simple readers, so the drain loop is
    ``processAllAvailable`` (the repo's multi-cycle convention).
    Complete mode is safe here because the key domain is 8 buckets;
    with an unbounded key domain the production shape is update mode
    into an idempotent merge sink — complete-mode state would grow
    with the domain. ``sf_dir`` is unused: the source IS the data
    (fixed n=400)."""
    from infofarmsparkml_spark.operators._util import scratch_dir
    from infofarmsparkml_spark.streaming.ops import _state_sized

    spark.dataSource.register(SynthStreamDataSource)
    src = (
        spark.readStream.format("ifsml_synthstream")
        .option("n", "400")
        .option("chunk", "200")
        .load()
    )
    agg = src.groupBy((F.col("id") % 8).cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("weight").alias("sum_weight"),
    )
    sink = "ifsml_pysource_stream"
    # Fresh checkpoint every run: resuming a COMMITTED checkpoint
    # would find no new offsets, trigger no batch, and leave the
    # (non-replaying) memory sink empty. Restart-recovery semantics
    # are exercised by stream_file_sink_exactly_once; this query
    # pins the source's offset/read contract within one lifetime.
    import shutil

    ckpt = scratch_dir("pysource_stream_ckpt", sf_dir)
    shutil.rmtree(ckpt, ignore_errors=True)
    with _state_sized(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)
    return spark.table(sink)
