"""Streaming SCD2 history via ``applyInPandasWithState``: the
incremental twin of the batch ``ev_scd2_state_intervals`` query
(workload/events.py) — per-user state runs are maintained across
micro-batches, CLOSED intervals are emitted exactly once when a state
change arrives, and the OPEN (current) interval is re-emitted each
batch it grows.

This is the streaming form of the reference's address-lifecycle
carry-forward (previous rows stay valid until superseded,
main_pls.py:123-133): the state store holds one tiny tuple per entity
(current state, run start, run length), so the operator's memory is
O(live entities), independent of history length — the property that
makes dimension-history maintenance viable on an unbounded CDC feed.

Ordering contract: events are sorted within each micro-batch, and
cross-batch order per user must be non-decreasing (true for replayed
logs and for watermarked sources that hold rows until the watermark
passes; a production deployment would buffer out-of-order rows in
state until the event-time watermark, exactly like the built-in
session windows do).

Scale: one shuffle on user_id per batch (state-store partitioning);
Arrow batches keep the transfer vectorized; state is constant-size
per user — add a ProcessingTimeTimeout TTL to drop idle entities.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("state", StringType(), False),
        StructField("valid_from", StringType(), False),
        StructField("valid_to", StringType(), True),
        StructField("is_current", BooleanType(), False),
        StructField("n_events", LongType(), False),
    ]
)

SCD2_STATE_SCHEMA = StructType(
    [
        StructField("cur", StringType(), True),
        StructField("from_us", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _fmt_us(us: int | None) -> str | None:
    """Whole-second interval boundaries — the output contract shared
    with the batch twin (ev_scd2_state_intervals truncates identically,
    so streaming-vs-batch reconciliation is exact). Consequence: two
    state runs of one user starting within the same second emit the
    SAME valid_from, so (user_id, valid_from) is NOT an interval key —
    consumers must key by (user_id, valid_from, state), and a feed with
    sub-second A→B→A flips of one entity needs this widened to
    microseconds (both twins + the oracle together, keeping them
    bit-identical)."""
    if us is None:
        return None
    return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")


def _update_scd2(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur, from_us, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    for ts, et in zip(batch["ts"], batch["event_type"]):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if cur is None:
            cur, from_us, n = et, ts_us, 1
        elif et == cur:
            n += 1
        else:
            closed.append((user_id, cur, _fmt_us(from_us), _fmt_us(ts_us), False, n))
            cur, from_us, n = et, ts_us, 1
    state.update((cur, from_us, n))
    rows = closed + [(user_id, cur, _fmt_us(from_us), None, True, n)]
    yield pd.DataFrame(
        rows,
        columns=[
            "user_id",
            "state",
            "valid_from",
            "valid_to",
            "is_current",
            "n_events",
        ],
    )


def scd2_state_intervals_stream(events: DataFrame) -> DataFrame:
    """SCD2 intervals over a streaming event frame; emit in update
    mode (closed intervals once, the open interval as it grows)."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_scd2,
            SCD2_OUTPUT_SCHEMA,
            SCD2_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
