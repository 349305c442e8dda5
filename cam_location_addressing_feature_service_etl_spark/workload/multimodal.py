"""Multimodal workload: binary-payload decode metadata (mapInPandas
stub) and frame sampling. The fake decode is pure byte-length
arithmetic, so even the pandas-UDF path has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary_payload,
    decode_image_meta,
    frame_sample_plan,
    stub_audio_meta_cols,
    stub_image_meta_cols,
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
    """Frame sampling: one row per 4th frame index per media item.
    Uses the column-expr meta twin — this stage plans over metadata
    only, so paying the Arrow decode round-trip again would be pure
    bench double-counting (mm_decode_image_meta is the mapInPandas
    representative)."""
    meta = stub_image_meta_cols(attach_binary_payload(_docs(spark, sf_dir)))
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
    """Aspect-preserving resize planning (bound to 224px) as pure
    column expressions over the column-expr meta twin. The Arrow
    ``resize_plan`` kernel (the production shape once pixels are real)
    is kept equivalence-tested against this form in
    tests/test_multimodal_kernels.py; the bench query avoids chaining
    two Python-worker stages for stub arithmetic."""
    meta = stub_image_meta_cols(attach_binary_payload(_docs(spark, sf_dir)))
    scale = F.least(F.lit(1.0), 224.0 / F.greatest("width", "height"))
    ow = F.floor(F.col("width") * scale).cast("long")
    oh = F.floor(F.col("height") * scale).cast("long")
    return meta.select(
        "doc_id",
        "width",
        "height",
        ow.alias("out_width"),
        oh.alias("out_height"),
        (ow * oh * 3).alias("out_bytes"),
    )


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
    """Audio modality: decode stub + 25ms/10ms framing plan as column
    expressions (JVM-side; the Arrow ``decode_audio_meta`` kernel keeps
    the production batch shape and is equivalence-tested in
    tests/test_multimodal_kernels.py). One mapInPandas query —
    mm_decode_image_meta — remains the pandas-stage representative."""
    return stub_audio_meta_cols(attach_binary_payload(_docs(spark, sf_dir)))


_PH_BITS = 16
_PH_MAXDIST = 2

_PH_BIT_SQL = " + ".join(
    # block i spans hex chars ((i*n)//16, ((i+1)*n)//16]; bit = leading
    # md5 nibble >= 8; little-endian packing — mirrors phash_bits_col
    f"(CASE WHEN substr(md5(substring(hx, (({i} * n) // {_PH_BITS}) + 1, "
    f"(({i} + 1) * n) // {_PH_BITS} - ({i} * n) // {_PH_BITS})), 1, 1) "
    f"IN ('8','9','a','b','c','d','e','f') THEN {1 << i} ELSE 0 END)"
    for i in range(_PH_BITS)
)


@register(
    "mm_phash_near_dup",
    oracle=f"""
WITH pl AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents),
pln AS (SELECT doc_id, hx, CAST(length(hx) AS BIGINT) AS n FROM pl),
ph AS (SELECT doc_id, CAST({_PH_BIT_SQL} AS BIGINT) AS phash FROM pln)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAXDIST}
""",
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup: a perceptual-hash stand-in (blockwise md5
    bits over the opaque binary payload — the shape of pHash without a
    pixel decoder) packed into a {b}-bit integer, then EXACT hamming
    pairs ≤ {d} via the same Manku chunk-index pigeonhole join the
    text SimHash uses — bucketed, never all-pairs. The oracle is the
    brute-force cross join, proving no candidate loss. This is how
    image/video dedup runs at 100 TB: hash map-side, join on index
    chunks."""
    from ..operators.dedup import simhash_pairs_exact
    from ..operators.multimodal import phash_bits_col

    docs = _docs(spark, sf_dir)
    ph = attach_binary_payload(docs).select(
        "doc_id", phash_bits_col(F.col("payload"), bits=_PH_BITS).alias("phash")
    )
    return simhash_pairs_exact(
        ph, "doc_id", "phash", bits=_PH_BITS, max_dist=_PH_MAXDIST
    ).select(F.col("id_a"), F.col("id_b"), F.col("hamming"))


mm_phash_near_dup.__doc__ = mm_phash_near_dup.__doc__.format(b=_PH_BITS, d=_PH_MAXDIST)
