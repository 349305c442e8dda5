"""Streaming quality-funnel monitor — the standing twin of the batch
``workload/llm_text.py text_quality_funnel``: a document stream folds
per-batch cumulative survival counters (lang → length → repetition →
quality, every predicate doc-local) into versioned state, and the
read derives the identical 4-row funnel table from the folded
counters.

Counters are exact mergeable integers (the ``streaming/chi2.py``
discipline): the funnel's sufficient statistics are ADDITIVE over
disjoint batches because every stage predicate depends only on the
doc itself, so state is ONE row, a fold touches the batch's map-side-
combined counts plus that row, and any batching reconciles bit-for-
bit with the one-shot query — both sides call the SAME
``funnel_doc_flags`` / ``funnel_counts`` / ``funnel_table_from_counts``
definitions, so a stage threshold can never drift between the
oracle-checked batch audit and the standing monitor. Exactly-once
from the versioned-fold replay discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..workload.llm_text import (
    funnel_counts,
    funnel_doc_flags,
    funnel_table_from_counts,
)
from .versioned import fold_version, read_latest

_STATE_SCHEMA = (
    "n_total bigint, k1 bigint, k2 bigint, k3 bigint, k4 bigint"
)
_COUNTERS = ("n_total", "k1", "k2", "k3", "k4")


def _merge(state: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        state.unionByName(funnel_counts(funnel_doc_flags(delta)))
        .agg(
            *[
                F.coalesce(F.sum(c), F.lit(0)).cast("long").alias(c)
                for c in _COUNTERS
            ]
        )
    )


def apply_document_batch(
    batch: DataFrame, batch_id: int, state_dir: str, retain_versions: int = 3
) -> None:
    """Fold one document micro-batch's survival counters into the
    versioned state. Idempotent under foreachBatch replay."""
    fold_version(
        batch, batch_id, state_dir, _STATE_SCHEMA, _merge, retain_versions
    )


def monitor_stream(
    documents: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    retain_versions: int = 3,
) -> StreamingQuery:
    """Run the funnel monitor over a (doc_id, lang, text) document
    stream."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_document_batch(batch, batch_id, state_dir, retain_versions)

    return (
        documents.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )


def read_funnel(spark: SparkSession, state_dir: str) -> DataFrame:
    """The standing funnel table — the batch query's exact output
    shape from the folded counters; empty before any batch folds."""
    return funnel_table_from_counts(
        read_latest(spark, state_dir, _STATE_SCHEMA)
    )
