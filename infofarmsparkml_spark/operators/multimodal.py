"""Multimodal columns (driver-mandated layer): media as opaque
BinaryType payloads with typed metadata, and Arrow-batched decode /
feature-extract plumbing via mapInPandas.

The container has no image/audio libs (PIL/soundfile/pyav), so we
use two real formats the stdlib can produce AND parse — WAV (the
``wave`` module) and binary PPM (P6, a plain 3-line header) — to
keep the decode kernel honest: payloads are genuine format bytes
synthesized per-row inside mapInPandas, and the decoder sniffs
magic bytes and parses the actual container structure. Metadata is
deterministic from doc_id, so the full encode→decode round trip is
hash-checked against a DuckDB oracle that independently predicts
byte sizes and dimensions. The 100 TB shape is the same as a
PIL/pyav pipeline: payloads stay columnar in Arrow batches
end-to-end, decode is per-batch in the workers, and nothing ever
collects to the driver.
"""

from __future__ import annotations

import io
import wave
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

_WAV_RATES = (8000, 16000, 22050, 44100)


def _synth_payload(doc_id: int, text: bytes) -> bytes:
    """Real format bytes, deterministic from doc_id: even ids get a
    binary PPM (P6) image whose pixel data is the doc text tiled to
    size; odd ids get a 16-bit mono PCM WAV of a 440 Hz tone."""
    d = doc_id // 2
    if doc_id % 2 == 0:
        w, h = 8 + d % 16, 8 + d % 9
        header = f"P6\n{w} {h}\n255\n".encode()
        n = 3 * w * h
        fill = text or b"\x00"
        body = (fill * (n // len(fill) + 1))[:n]
        return header + body
    rate = _WAV_RATES[d % 4]
    n_frames = 256 + d % 250
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        import numpy as np

        t = np.arange(n_frames, dtype="float64")
        samples = (np.sin(2 * np.pi * 440.0 * t / rate) * 32000).astype("<i2")
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def _encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch payload synthesis — runs in the workers, so blob
    construction scales with the corpus, never the driver."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    _synth_payload(int(i), t.encode("utf-8"))
                    for i, t in zip(pdf["doc_id"], pdf["text"].fillna(""))
                ],
            }
        )


def _decode_one(payload: bytes) -> tuple[str, int, int, int, int, str]:
    """(media_type, width, height, sample_rate, n_frames, status) —
    parses the actual container bytes, no side-channel metadata."""
    if payload[:2] == b"P6":
        # P6\n<width> <height>\n<maxval>\n<raw RGB>
        try:
            _, dims, _ = payload.split(b"\n", 2)
            w, h = (int(x) for x in dims.split())
            return "image", w, h, 0, 1, "ok"
        except (ValueError, IndexError):
            return "image", 0, 0, 0, 0, "corrupt"
    if payload[:4] == b"RIFF":
        try:
            with wave.open(io.BytesIO(payload)) as wv:
                return (
                    "audio", 0, 0,
                    wv.getframerate(), wv.getnframes(), "ok",
                )
        except wave.Error:
            return "audio", 0, 0, 0, 0, "corrupt"
    return "unknown", 0, 0, 0, 0, "unsupported"


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch decode: same Arrow-batched shape a PIL/pyav kernel
    would use."""
    for pdf in batches:
        meta = [_decode_one(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            meta,
            columns=[
                "media_type", "width", "height",
                "sample_rate", "n_frames", "decode_status",
            ],
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        out.insert(2, "payload_bytes", pdf["payload"].map(len).astype("int32"))
        for c in ("width", "height", "sample_rate", "n_frames"):
            out[c] = out[c].astype("int32")
        yield out


@query(
    "mm_decode_wav_ppm",
    oracle="""
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
  CAST(CASE WHEN doc_id % 2 = 0
    THEN length('P6' || chr(10)
                || CAST(8 + (doc_id // 2) % 16 AS VARCHAR) || ' '
                || CAST(8 + (doc_id // 2) % 9 AS VARCHAR)
                || chr(10) || '255' || chr(10))
         + 3 * (8 + (doc_id // 2) % 16) * (8 + (doc_id // 2) % 9)
    ELSE 44 + 2 * (256 + (doc_id // 2) % 250)
    END AS INTEGER) AS payload_bytes,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id // 2) % 16 ELSE 0 END
       AS INTEGER) AS width,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id // 2) % 9 ELSE 0 END
       AS INTEGER) AS height,
  CAST(CASE WHEN doc_id % 2 = 1
    THEN [8000, 16000, 22050, 44100][((doc_id // 2) % 4) + 1] ELSE 0 END
    AS INTEGER) AS sample_rate,
  CAST(CASE WHEN doc_id % 2 = 1 THEN 256 + (doc_id // 2) % 250 ELSE 1 END
       AS INTEGER) AS n_frames,
  'ok' AS decode_status
FROM documents
""",
)
def mm_decode_wav_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary payloads via
    mapInPandas: Arrow batches in, typed metadata out. Payloads are
    REAL WAV / PPM bytes synthesized per row in the workers and the
    decoder parses the genuine container structure (wave module /
    P6 header); the oracle predicts the byte sizes and dimensions
    independently, so a mis-parse fails the hash. Partitioning is
    inherited from the scan — at 100 TB you size maxPartitionBytes
    so a batch of payloads fits worker memory. The 44-byte RIFF
    header constant in the oracle is the standard PCM WAV header
    the wave module emits."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", "text").mapInPandas(
        _encode_batch, schema="doc_id long, payload binary"
    )
    return payloads.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)


_RESIZE_SCHEMA = (
    "doc_id long, in_w int, in_h int, out_w int, out_h int, "
    "out_bytes int, reparse_status string"
)


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch nearest-neighbor 2x downsample of PPM payloads —
    the pure-numpy stand-in for a PIL/opencv resize kernel, same
    Arrow-batched shape. The resized image is re-encoded as PPM and
    re-parsed by the shared decoder, so a malformed re-encode fails
    loudly instead of producing unverifiable bytes."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, dims, rest = bytes(payload).split(b"\n", 2)
            w, h = (int(x) for x in dims.split())
            body = rest.split(b"\n", 1)[1]
            px = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
            small = px[::2, ::2, :]  # nearest-neighbor stride-2
            oh, ow = small.shape[:2]
            out = f"P6\n{ow} {oh}\n255\n".encode() + small.tobytes()
            kind, rw, rh, _, _, status = _decode_one(out)
            ok = "ok" if (kind, rw, rh, status) == ("image", ow, oh, "ok") else "bad"
            rows.append((int(doc_id), w, h, ow, oh, len(out), ok))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "in_w", "in_h", "out_w", "out_h",
                "out_bytes", "reparse_status",
            ],
        ).astype({c: "int32" for c in ("in_w", "in_h", "out_w", "out_h", "out_bytes")})


@query(
    "mm_resize_ppm",
    oracle="""
WITH img AS (
  SELECT doc_id,
         8 + (doc_id // 2) % 16 AS w,
         8 + (doc_id // 2) % 9 AS h
  FROM documents WHERE doc_id % 2 = 0),
rs AS (
  SELECT doc_id, w, h,
         (w + 1) // 2 AS ow, (h + 1) // 2 AS oh
  FROM img)
SELECT doc_id,
       CAST(w AS INTEGER) AS in_w, CAST(h AS INTEGER) AS in_h,
       CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
       CAST(length('P6' || chr(10) || CAST(ow AS VARCHAR) || ' '
                   || CAST(oh AS VARCHAR) || chr(10) || '255' || chr(10))
            + 3 * ow * oh AS INTEGER) AS out_bytes,
       'ok' AS reparse_status
FROM rs
""",
)
def mm_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over binary media columns: synthesize each even
    doc's PPM in the workers, stride-2 nearest-neighbor downsample
    it in numpy, re-encode, and re-parse the result with the shared
    decoder — all inside one mapInPandas chain, payloads columnar in
    Arrow end to end, nothing at the driver. The oracle predicts the
    exact output dimensions (ceil(w/2) x ceil(h/2)) and re-encoded
    byte size per doc, so a wrong stride, header, or byte count
    fails the hash. This is the resize step of a real multimodal
    pipeline with PIL swapped for a deterministic stdlib kernel."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    ).select("doc_id", "text")
    payloads = docs.mapInPandas(_encode_batch, "doc_id long, payload binary")
    return payloads.mapInPandas(_resize_batch, _RESIZE_SCHEMA)


_FRAME_SCHEMA = (
    "doc_id long, n_frames int, frame_idx int, byte_offset int, "
    "frame_bytes int, frame_status string"
)


def _synth_video(doc_id: int, text: bytes) -> bytes:
    """Deterministic fake video container: a parseable text header
    `VID\\n<w> <h> <n_frames>\\n` followed by n_frames raw frames of
    w*h*3 bytes. Byte 0 of frame k is the marker k % 256 (so a
    mis-computed offset reads a misaligned byte and fails loudly);
    the rest is the doc text tiled."""
    w, h, n = 4 + doc_id % 6, 3 + doc_id % 5, 16 + doc_id % 48
    frame_len = 3 * w * h
    fill = text or b"\x00"
    body = (fill * (frame_len // len(fill) + 1))[: frame_len - 1]
    frames = b"".join(bytes([k % 256]) + body for k in range(n))
    return f"VID\n{w} {h} {n}\n".encode() + frames


def _frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-batch frame sampling: parse the container header, slice
    every 4th frame out of the real payload bytes, and verify each
    sampled frame's index marker — the pyav keyframe-sampling shape
    with the codec swapped for a deterministic stdlib parser."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            magic, dims, rest = raw.split(b"\n", 2)
            if magic != b"VID":
                rows.append((int(doc_id), 0, -1, -1, -1, "corrupt"))
                continue
            w, h, n = (int(x) for x in dims.split())
            frame_len = 3 * w * h
            header_len = len(raw) - n * frame_len
            for k in range(0, n, 4):
                off = header_len + k * frame_len
                frame = raw[off : off + frame_len]
                ok = (
                    "ok"
                    if len(frame) == frame_len and frame[0] == k % 256
                    else "bad_marker"
                )
                rows.append((int(doc_id), n, k, off, len(frame), ok))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "frame_idx", "byte_offset",
                "frame_bytes", "frame_status",
            ],
        ).astype(
            {
                c: "int32"
                for c in ("n_frames", "frame_idx", "byte_offset", "frame_bytes")
            }
        )


def _encode_video_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    _synth_video(int(i), t.encode("utf-8"))
                    for i, t in zip(pdf["doc_id"], pdf["text"].fillna(""))
                ],
            }
        )


@query(
    "mm_frame_sample",
    oracle="""
WITH v AS (
  SELECT doc_id,
         4 + doc_id % 6 AS w,
         3 + doc_id % 5 AS h,
         16 + doc_id % 48 AS n
  FROM documents),
hdr AS (
  SELECT doc_id, n, 3 * w * h AS frame_len,
         length('VID' || chr(10) || CAST(w AS VARCHAR) || ' '
                || CAST(h AS VARCHAR) || ' ' || CAST(n AS VARCHAR)
                || chr(10)) AS header_len
  FROM v)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_frames,
       CAST(k AS INTEGER) AS frame_idx,
       CAST(header_len + k * frame_len AS INTEGER) AS byte_offset,
       CAST(frame_len AS INTEGER) AS frame_bytes,
       'ok' AS frame_status
FROM hdr, UNNEST(range(0, n, 4)) AS t(k)
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over binary media columns: synthesize
    each doc's frame container in the workers, parse the header,
    slice every 4th frame out of the actual bytes, and check each
    frame's index marker — one mapInPandas chain, payloads columnar
    in Arrow end to end, output exploded to one row per sampled
    frame (the fan-out a real keyframe extractor produces). The
    oracle independently predicts frame count, byte offsets and
    sizes per doc, so off-by-one slicing or header arithmetic fails
    the hash; the in-kernel marker check additionally pins the
    CONTENT at each offset, which no size oracle could see. A real
    pyav/ffmpeg decode drops into `_frame_sample_batch` with the
    same schema and partitioning."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        _encode_video_batch, "doc_id long, payload binary"
    )
    return payloads.mapInPandas(_frame_sample_batch, _FRAME_SCHEMA)


_AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_frames int, duration_ms int, "
    "rms double, zero_crossings int, peak int"
)


def _audio_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-batch audio feature extraction from real WAV bytes:
    parse the container with the stdlib wave module, decode int16
    PCM with numpy, and emit clip-level features — the librosa-style
    kernel with the DSP library swapped for deterministic numpy."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with wave.open(io.BytesIO(bytes(payload))) as wv:
                rate, n = wv.getframerate(), wv.getnframes()
                pcm = np.frombuffer(wv.readframes(n), dtype="<i2")
            x = pcm.astype("float64")
            rms = float(np.sqrt(np.mean(x * x)))
            zc = int(np.sum((pcm[:-1] < 0) != (pcm[1:] < 0)))
            rows.append(
                (
                    int(doc_id), rate, n, n * 1000 // rate,
                    round(rms, 4), zc, int(np.max(np.abs(pcm))),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "sample_rate", "n_frames", "duration_ms",
                "rms", "zero_crossings", "peak",
            ],
        ).astype(
            {c: "int32" for c in
             ("sample_rate", "n_frames", "duration_ms", "zero_crossings", "peak")}
        )


@query("mm_audio_features")  # float DSP features: rows-only by design
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over binary media columns: odd docs'
    WAV payloads are synthesized in the workers, container-parsed
    with the stdlib wave module, and reduced to clip-level features
    (RMS energy, zero-crossing count, peak amplitude, duration) in
    one mapInPandas chain — Arrow-batched payloads end to end, the
    shape a librosa/torchaudio pipeline drops into. RMS/ZCR are
    genuine DSP floats over the decoded samples, so this registers
    rows-only; tests/test_operators.py verifies every feature
    against an independent per-clip numpy recomputation and the
    440 Hz analytic expectations (RMS ≈ 32000/√2, ZCR ≈ 2·440·dur)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 1
    ).select("doc_id", "text")
    payloads = docs.mapInPandas(_encode_batch, "doc_id long, payload binary")
    return payloads.mapInPandas(_audio_features_batch, _AUDIO_SCHEMA)
