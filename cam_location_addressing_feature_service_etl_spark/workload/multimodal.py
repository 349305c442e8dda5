"""Multimodal workload: binary-payload decode metadata (mapInPandas
stub) and frame sampling. The fake decode is pure byte-length
arithmetic, so even the pandas-UDF path has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_binary_payload,
    decode_image_meta,
    frame_sample_plan,
)
from ..session import tune
from ..tables import load
from . import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load(spark, sf_dir, "documents")


@register(
    "mm_decode_image_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT)             AS byte_len,
       CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT)  AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 16 AS BIGINT) AS height,
       CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT)    AS n_frames
FROM documents
""",
)
def mm_decode_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed metadata via Arrow-batched mapInPandas
    (decode itself is a deterministic stub; plumbing is production)."""
    return decode_image_meta(attach_binary_payload(_docs(spark, sf_dir)))


@register(
    "mm_frame_sample",
    oracle="""
WITH meta AS (
  SELECT doc_id, CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx FROM meta
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per 4th frame index per media item."""
    meta = decode_image_meta(attach_binary_payload(_docs(spark, sf_dir)))
    return frame_sample_plan(meta, every=4).select("doc_id", "frame_idx")


@register(
    "mm_resize_plan",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT)       AS width,
         CAST((octet_length(encode(text)) * 7) % 480 + 16 AS BIGINT) AS height
  FROM documents
),
scaled AS (
  SELECT doc_id, width, height,
         LEAST(1.0, 224.0 / GREATEST(width, height)) AS scale
  FROM meta
)
SELECT doc_id, width, height,
       CAST(FLOOR(width * scale) AS BIGINT)  AS out_width,
       CAST(FLOOR(height * scale) AS BIGINT) AS out_height,
       CAST(FLOOR(width * scale) * FLOOR(height * scale) * 3 AS BIGINT) AS out_bytes
FROM scaled
""",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize stage (bound to 224px): decode →
    resize as chained Arrow mapInPandas stages — the standard
    image-preprocessing shape for vision training data. Pixel work is
    stubbed; dim arithmetic, schema, and batch plumbing are real and
    oracle-checked."""
    from ..operators.multimodal import resize_plan

    meta = decode_image_meta(attach_binary_payload(_docs(spark, sf_dir)))
    return resize_plan(meta, max_side=224)


@register(
    "mm_audio_frame_plan",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
  FROM documents
),
derived AS (
  SELECT doc_id, byte_len,
         8000 + (byte_len % 3) * 4000 AS sample_rate,
         (byte_len * 13) % 32000 + 800 AS n_samples
  FROM meta
)
SELECT doc_id, byte_len,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(FLOOR(n_samples * 1000 / sample_rate) AS BIGINT) AS duration_ms,
       CAST(GREATEST(FLOOR((n_samples - 400) / 160) + 1, 0) AS BIGINT) AS n_windows
FROM derived
""",
)
def mm_audio_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality: decode stub + 25ms/10ms framing plan via Arrow
    mapInPandas — the STT/audio-embedding preprocessing shape. Decode
    is stubbed (no audio libs here); framing arithmetic, schema, and
    batch plumbing are real and oracle-checked."""
    from ..operators.multimodal import decode_audio_meta

    return decode_audio_meta(attach_binary_payload(_docs(spark, sf_dir)))
