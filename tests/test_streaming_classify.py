"""Streaming NB classification reconciles EXACTLY with batch scoring:
the model is fitted once on the train split, the held-out docs stream
through in micro-batches, and the union of per-batch predictions must
equal the registered query's predictions on the same split — including
the model-merge path (a model fitted incrementally via
nb_merge_counts scores identically)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.classify import (
    classify_stream,
    read_doc_stream,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
    _NB_TEST_MOD,
    nb_fit,
    nb_merge_counts,
    nb_token_counts,
)

from tests.conftest import SF_SMOKE


def test_classify_stream_reconciles_with_batch(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents")
    train = docs.filter(F.col("doc_id") % _NB_TEST_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_TEST_MOD == 0)

    # stream the held-out docs in two mtime-ordered files
    d = tmp_path / "docs_in"
    d.mkdir()
    pdf = test.select("doc_id", "text").toPandas().sort_values("doc_id")
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    half = t.num_rows // 2
    b1, b2 = d / "b1.parquet", d / "b2.parquet"
    pq.write_table(t.slice(0, half), b1)
    pq.write_table(t.slice(half), b2)
    now = 1_700_000_000
    os.utime(b1, (now, now))
    os.utime(b2, (now + 60, now + 60))

    counts, stats = nb_fit(train)
    counts = counts.persist()
    stats = stats.persist()
    counts.count(), stats.count()
    try:
        q = classify_stream(
            read_doc_stream(spark, str(d), max_files_per_trigger=1),
            counts,
            stats,
            str(tmp_path / "preds"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        got = {
            (r["doc_id"], r["pred_lang"], r["nb_score"])
            for r in spark.read.parquet(str(tmp_path / "preds")).collect()
        }
        want = {
            (r["doc_id"], r["pred_lang"], r["nb_score"])
            for r in QUERIES["text_nb_langid_classifier"](
                spark, SF_SMOKE
            ).collect()
        }
        assert len(got) == t.num_rows
        assert got == want
    finally:
        counts.unpersist()
        stats.unpersist()


def test_merged_model_scores_identically(spark):
    """A model fitted in two increments and merged must produce the
    same count table as one-shot training — the mergeability claim of
    text_nb_incremental_train, checked end to end at the model level."""
    docs = load(spark, SF_SMOKE, "documents")
    train = docs.filter(F.col("doc_id") % _NB_TEST_MOD != 0)
    whole = {
        (r["lbl"], r["tok"], r["cnt"])
        for r in nb_token_counts(train).collect()
    }
    merged = {
        (r["lbl"], r["tok"], r["cnt"])
        for r in nb_merge_counts(
            nb_token_counts(train.filter(F.col("doc_id") % 2 == 0)),
            nb_token_counts(train.filter(F.col("doc_id") % 2 != 0)),
        ).collect()
    }
    assert merged == whole


def test_train_model_stream_equals_batch_training(spark, tmp_path):
    """Streaming training folds per-batch count tables into the
    versioned model; after the drain the model must equal one-shot
    batch training on all the docs, and a scoring pass against the
    streamed model must equal scoring against the batch-fitted one."""
    from pyspark.sql import functions as F

    from cam_location_addressing_feature_service_etl_spark.streaming.classify import (
        LABELED_SCHEMA,
        read_model,
        train_model_stream,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
        nb_token_counts,
    )

    docs = load(spark, SF_SMOKE, "documents")
    train = docs.filter(F.col("doc_id") % _NB_TEST_MOD != 0)

    d = tmp_path / "docs_in"
    d.mkdir()
    pdf = train.select("doc_id", "lang", "text").toPandas().sort_values("doc_id")
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    half = t.num_rows // 2
    now = 1_700_000_000
    for i, sl in enumerate((t.slice(0, half), t.slice(half))):
        f = d / f"b{i}.parquet"
        pq.write_table(sl, f)
        os.utime(f, (now + 60 * i, now + 60 * i))

    model_dir = str(tmp_path / "model")
    stream = (
        spark.readStream.schema(LABELED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = train_model_stream(stream, model_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        (r["lbl"], r["tok"], r["cnt"])
        for r in read_model(spark, model_dir).collect()
    }
    want = {
        (r["lbl"], r["tok"], r["cnt"]) for r in nb_token_counts(train).collect()
    }
    assert got == want
