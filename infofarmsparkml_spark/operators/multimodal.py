"""Multimodal columns (driver-mandated layer): media as opaque
BinaryType payloads with typed metadata, and Arrow-batched decode /
feature-extract plumbing via mapInPandas.

The container has no image/audio libs, so the decode step is a
clearly-marked deterministic STUB (set IFSML_REAL_DECODE=1 to hit
the NotImplementedError for the real path) — but the Spark-side
plumbing (schema, Arrow batch shape, partitioning) is real and
tested, which is the part that matters for the 100 TB design:
payloads stay columnar in Arrow batches end-to-end, metadata is
computed per batch, and nothing ever collects to the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from infofarmsparkml_spark.operators._util import load_table
from infofarmsparkml_spark.registry import query


@query(
    "mm_binary_metadata",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes,
       substring(hex(encode(text)), 1, 16) AS payload_hex16,
       md5(text) AS payload_md5
FROM documents
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload assembly — text bytes stand in for media
    blobs; emits size, hex prefix and digest metadata. BinaryType
    columns ride parquet/Arrow as-is at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("payload_bytes"),
        F.substring(F.hex(payload), 1, 16).alias("payload_hex16"),
        F.md5("text").alias("payload_md5"),
    )


_DECODE_SCHEMA = (
    "doc_id long, media_type string, payload_bytes int, "
    "width int, height int, sample_rate int, n_frames int, decode_status string"
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch 'decode': real implementation would call PIL /
    soundfile / pyav here on each payload."""
    real = os.environ.get("IFSML_REAL_DECODE") == "1"
    for pdf in batches:
        if real:
            raise NotImplementedError(
                "real media decode requires PIL/soundfile/pyav, "
                "not present in this container"
            )
        ids = pdf["doc_id"]
        media = ids % 3
        nbytes = pdf["payload"].map(len).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "media_type": media.map({0: "image", 1: "audio", 2: "video"}),
                "payload_bytes": nbytes,
                # deterministic fake metadata derived from the payload
                "width": (64 + (ids % 16) * 8).where(media != 1, 0).astype("int32"),
                "height": (64 + (ids % 9) * 16).where(media != 1, 0).astype("int32"),
                "sample_rate": (16000).__mul__(1) * (media == 1).astype("int32"),
                "n_frames": (1 + (nbytes % 250) * (media == 2)).astype("int32"),
                "decode_status": "stub_ok",
            }
        )


@query("mm_decode_stub")  # decode is stubbed (no media libs): rows-only
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary payloads via
    mapInPandas: Arrow batches in, typed metadata out. Partitioning
    is inherited from the scan — at 100 TB you size
    maxPartitionBytes so a batch of payloads fits worker memory."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)
