"""The Arrow mapInPandas multimodal kernels (production batch shape)
must stay value-identical to the JVM column-expr twins the bench
queries use — and the PIL-backed real decoder must work end-to-end
where Pillow is available (skipped here otherwise)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_audio_meta,
    decode_image_meta,
    decode_real,
    resize_plan,
    stub_audio_meta_cols,
    stub_image_meta_cols,
)
from cam_location_addressing_feature_service_etl_spark.tables import load

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def payloads(spark):
    return attach_binary_payload(load(spark, SF_SMOKE, "documents"))


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_image_kernel_matches_column_exprs(payloads):
    _assert_same(decode_image_meta(payloads), stub_image_meta_cols(payloads))


def test_audio_kernel_matches_column_exprs(payloads):
    _assert_same(decode_audio_meta(payloads), stub_audio_meta_cols(payloads))


def test_resize_kernel_matches_column_exprs(payloads):
    meta = stub_image_meta_cols(payloads)
    scale = F.least(F.lit(1.0), 224.0 / F.greatest("width", "height"))
    ow = F.floor(F.col("width") * scale).cast("long")
    oh = F.floor(F.col("height") * scale).cast("long")
    expected = meta.select(
        "doc_id", "width", "height",
        ow.alias("out_width"), oh.alias("out_height"),
        (ow * oh * 3).alias("out_bytes"),
    )
    _assert_same(resize_plan(meta, max_side=224), expected)


def test_decode_real_requires_pillow_or_decodes(spark):
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        # the gate itself is the contract in PIL-less environments
        df = spark.createDataFrame([(1, b"notanimage")], "doc_id long, payload binary")
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_real(df)
        return

    buf = BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue())], "doc_id long, payload binary")
    [row] = decode_real(df).collect()
    assert (row["width"], row["height"], row["n_frames"]) == (3, 2, 1)
    assert row["byte_len"] == len(buf.getvalue())


def test_phash_bits_change_locally_with_payload(spark):
    from pyspark.sql import functions as F

    from cam_location_addressing_feature_service_etl_spark.operators.multimodal import (
        phash_bits_col,
    )

    df = spark.createDataFrame(
        [(1, "same content here"), (2, "same content here"), (3, "entirely different")],
        "doc_id long, text string",
    ).select("doc_id", F.col("text").cast("binary").alias("payload"))
    got = {r["doc_id"]: r["ph"] for r in df.select(
        "doc_id", phash_bits_col(F.col("payload")).alias("ph")
    ).collect()}
    assert got[1] == got[2]            # identical bytes -> identical hash
    assert got[1] != got[3]            # different bytes -> different hash
    assert all(0 <= v < (1 << 16) for v in got.values())
