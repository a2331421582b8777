"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata extracted inside Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image``/``decode_audio`` raise
``NotImplementedError``); the deterministic *header parse* is real and
exercises the full Spark plumbing — binary Arrow columns in, typed
struct-ish columns out, batch-shaped pandas processing, no per-row
Python dispatch at the Spark layer.

For the oracle, the synthetic media table derives its blobs from
``documents.text`` (UTF-8 bytes), so the header fields are
reproducible in pure SQL (`ascii`/`sha256`/`octet_length`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from docwire_spark.ops.common import load

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sha256", StringType()),
    ]
)


def decode_image(blob: bytes):  # pragma: no cover - stub by design
    """Full image decode (PIL/libvips) — not available in this
    container.  The Spark-side plumbing (binary column -> mapInPandas
    -> feature columns) is real; swap this stub for a codec on a
    cluster with the libs installed."""
    raise NotImplementedError("image codecs not installed in this environment")


def decode_audio(blob: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError("audio codecs not installed in this environment")


def parse_media_header(blob: bytes, kind: str) -> dict:
    """Deterministic fake header parse (stands in for reading e.g. the
    PNG IHDR / WAV fmt chunk): derives dimensions from the first
    payload bytes."""
    import hashlib

    b0 = blob[0] if blob else 0
    b1 = blob[1] if len(blob) > 1 else 0
    out = {
        "byte_len": len(blob),
        "width": None,
        "height": None,
        "duration_ms": None,
        "sha256": hashlib.sha256(blob).hexdigest(),
    }
    if kind in ("image", "video"):
        out["width"] = 16 + (b0 % 16) * 8
        out["height"] = 16 + (b1 % 16) * 8
    if kind in ("audio", "video"):
        out["duration_ms"] = len(blob) * 3
    return out


def _media_batches(iterator):
    import pandas as pd

    for pdf in iterator:
        rows = {k.name: [] for k in META_SCHEMA.fields}
        for doc_id, kind, blob in zip(pdf["doc_id"], pdf["kind"], pdf["blob"]):
            blob = bytes(blob) if blob is not None else b""
            hdr = parse_media_header(blob, kind)
            rows["doc_id"].append(doc_id)
            rows["kind"].append(kind)
            rows["byte_len"].append(hdr["byte_len"])
            rows["width"].append(hdr["width"])
            rows["height"].append(hdr["height"])
            rows["duration_ms"].append(hdr["duration_ms"])
            rows["sha256"].append(hdr["sha256"])
        yield pd.DataFrame(rows)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: blob = UTF-8 bytes of the document
    text, kind cycling image/audio/video by doc_id."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "UTF-8").alias("blob"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spark, sf_dir).mapInPandas(_media_batches, META_SCHEMA)


MULTIMODAL_META_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text, encode(text) AS blob
  FROM documents
)
SELECT doc_id, kind,
       CAST(octet_length(blob) AS BIGINT) AS byte_len,
       CASE WHEN kind IN ('image', 'video')
            THEN CAST(16 + (ascii(substr(text, 1, 1)) % 16) * 8 AS BIGINT)
            END AS width,
       CASE WHEN kind IN ('image', 'video')
            THEN CAST(16 + (ascii(substr(text, 2, 1)) % 16) * 8 AS BIGINT)
            END AS height,
       CASE WHEN kind IN ('audio', 'video')
            THEN CAST(octet_length(blob) * 3 AS BIGINT)
            END AS duration_ms,
       sha256(text) AS sha256
FROM m
"""

# ---------------------------------------------------------------------------
# frame sampling (one-to-many media op)
# ---------------------------------------------------------------------------

FRAME_INTERVAL_MS = 100
MAX_FRAMES = 8

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(blob: bytes, duration_ms: int):
    """Deterministic fake frame decode (stands in for an ffmpeg
    keyframe pull): one frame per FRAME_INTERVAL_MS up to MAX_FRAMES;
    each "frame" is a 16-byte slice of the payload at a stride-37
    offset.  The plumbing — one input row fanning out to N output
    rows inside the Arrow batch — is the real thing; swap this for a
    codec on a cluster that has one."""
    import hashlib

    n = min(duration_ms // FRAME_INTERVAL_MS + 1, MAX_FRAMES)
    window = max(len(blob) - 15, 1)
    out = []
    for k in range(n):
        off = (k * 37) % window
        frame = blob[off:off + 16]
        out.append((k, k * FRAME_INTERVAL_MS,
                    hashlib.sha256(frame).hexdigest()))
    return out


def _frame_batches(iterator):
    import pandas as pd

    for pdf in iterator:
        rows = {k.name: [] for k in FRAMES_SCHEMA.fields}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            blob = bytes(blob) if blob is not None else b""
            for idx, ts, sha in sample_frames(blob, len(blob) * 3):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["ts_ms"].append(ts)
                rows["frame_sha"].append(sha)
        yield pd.DataFrame(rows)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video slice of the media table: binary
    column in, N frame rows out per video (the one-to-many mapInPandas
    shape video/audio feature extraction needs)."""
    videos = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    return videos.select("doc_id", "blob").mapInPandas(
        _frame_batches, FRAMES_SCHEMA
    )


MULTIMODAL_FRAMES_SQL = f"""
WITH v AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT doc_id, text, n, g.k AS frame_idx
  FROM v, generate_series(0, {MAX_FRAMES - 1}) g(k)
  WHERE g.k < least(n * 3 // {FRAME_INTERVAL_MS} + 1, {MAX_FRAMES})
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * {FRAME_INTERVAL_MS} AS BIGINT) AS ts_ms,
       sha256(substr(text,
                     ((frame_idx * 37) % greatest(n - 15, 1)) + 1, 16))
         AS frame_sha
FROM f
"""

QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_frames": multimodal_frames,
}
ORACLES = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
}
