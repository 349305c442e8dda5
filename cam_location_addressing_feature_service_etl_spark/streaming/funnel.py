"""Streaming funnel-stage tracker via ``applyInPandasWithState`` —
the stateful twin of the batch ``ev_funnel_conversion`` query.

Per-user state machine: stage 0 → viewed → clicked-after-view →
purchased-after-click. State carries the three stage timestamps
(epoch micros, -1 = not reached) across micro-batches; each batch
emits the user's current stage. Under ordered replay (micro-batches
arrive in event-time order) the final emission per user matches the
batch funnel exactly; late cross-batch data is the usual streaming
trade-off — add a watermark-buffered reorder stage upstream if the
source can deliver out of order.

Scale notes: state is three longs per user in the state store,
partitioned by user_id (one shuffle per batch); the per-batch update
is vectorized pandas min/filter, not a per-row Python loop. Set a
``GroupStateTimeout`` TTL in production to drop idle users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("funnel_stage", LongType(), False),
        StructField("t_view_us", LongType(), False),
        StructField("t_click_us", LongType(), False),
        StructField("t_purchase_us", LongType(), False),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t_view_us", LongType(), False),
        StructField("t_click_us", LongType(), False),
        StructField("t_purchase_us", LongType(), False),
    ]
)

_NONE = -1


def _min_ts(pdf: pd.DataFrame, mask: pd.Series, current: int) -> int:
    """Earliest ts (µs) among masked rows, folded into current (-1=unset)."""
    if mask.any():
        batch_min = int(pdf.loc[mask, "ts_us"].min())
        return batch_min if current == _NONE else min(current, batch_min)
    return current


def _update_funnel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t_view, t_click, t_purchase = (
        state.get if state.exists else (_NONE, _NONE, _NONE)
    )
    # Arrow delivers a group as multiple chunks in arbitrary order; the
    # stage scan must see the whole micro-batch at once or a purchase in
    # an earlier chunk than its unlocking click would be dropped (each
    # stage's threshold depends on the previous stage's batch-final
    # value, so a single forward pass over chunks can't be correct).
    # Tradeoff: this materializes one key's micro-batch in memory —
    # bounded here to the two columns the scan needs (event_type,
    # ts_us), so a hot key costs ~16 bytes/event, not the full row.
    pdf = pd.concat(
        [
            c.assign(ts_us=c["ts"].astype("int64") // 1000)[["event_type", "ts_us"]]
            for c in pdfs
        ],
        ignore_index=True,
    )
    t_view = _min_ts(pdf, pdf["event_type"] == "view", t_view)
    if t_view != _NONE:
        t_click = _min_ts(
            pdf,
            (pdf["event_type"] == "click") & (pdf["ts_us"] > t_view),
            t_click,
        )
    if t_click != _NONE:
        t_purchase = _min_ts(
            pdf,
            (pdf["event_type"] == "purchase") & (pdf["ts_us"] > t_click),
            t_purchase,
        )
    state.update((t_view, t_click, t_purchase))
    stage = 3 if t_purchase != _NONE else 2 if t_click != _NONE else 1 if t_view != _NONE else 0
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "funnel_stage": [stage],
            "t_view_us": [t_view],
            "t_click_us": [t_click],
            "t_purchase_us": [t_purchase],
        }
    )


def funnel_stage_tracker(events: DataFrame) -> DataFrame:
    """Per-user funnel stage, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
