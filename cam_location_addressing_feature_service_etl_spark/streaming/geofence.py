"""Streaming geofence enter/exit detection via
``applyInPandasWithState`` — the alerting operator of a location
engine (the streaming twin of ``workload.geo geo_fence_transitions``).

State per user is ONE integer (the inside/outside flag after the last
processed event), so the state store stays O(active users) no matter
how long the stream runs. Each micro-batch sorts the user's new events
by (ts, event_id), seeds the flag sequence from the stored state, and
emits exactly the rows where the flag flips — byte-identical to the
batch lag-window query on the same prefix, proven micro-batch-split-
insensitively in ``tests/test_streaming_geofence.py``.

Ordering contract: transitions are defined by event-time order, so the
operator assumes events of one user arrive in event-time order ACROSS
micro-batches (within a batch it sorts). A source with late data needs
a watermark + reorder buffer upstream — same caveat as every
transition/sessionization operator, documented not hidden.

Position arithmetic is the fixed-point story of the batch twin: the
int64 mod grid is exact, and the double division/addition are
correctly-rounded IEEE ops that numpy, the JVM, and DuckDB all agree
on bit-for-bit (see the CAST AS DOUBLE note in workload/geo.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..workload.geo import _EV_POS_LAT, _EV_POS_LON, _POLY

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts_s", StringType(), False),
        StructField("direction", StringType(), False),
    ]
)

#: last inside/outside flag (0/1); absent state means "never seen".
STATE_SCHEMA = StructType([StructField("last_inside", LongType(), False)])


def _positions(event_id: np.ndarray, user_id: int) -> tuple[np.ndarray, np.ndarray]:
    uid = np.int64(user_id)

    def axis(spec):
        base, a, b, m = spec
        return base + ((event_id * a + uid * b) % m).astype(np.float64) / 100.0

    # same (base, mult, mult, mod) constants as the batch SQL — one
    # definition site (workload/geo.py _EV_POS_*)
    return axis(_EV_POS_LAT), axis(_EV_POS_LON)


def _inside(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    ok = np.ones(lat.shape, dtype=bool)
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        ok &= (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) >= 0
    return ok.astype(np.int64)


def _update_fence(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last = int(state.get[0]) if state.exists else -1
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    eid = pdf["event_id"].to_numpy(np.int64)
    inside = _inside(*_positions(eid, int(user_id)))
    prev = np.empty_like(inside)
    prev[0] = last
    prev[1:] = inside[:-1]
    state.update((int(inside[-1]),))
    flip = (prev >= 0) & (prev != inside)
    if not flip.any():
        return
    hit = pdf.loc[flip]
    yield pd.DataFrame(
        {
            "user_id": np.full(int(flip.sum()), np.int64(user_id)),
            "event_id": hit["event_id"].to_numpy(np.int64),
            "ts_s": hit["ts"].dt.strftime("%Y-%m-%d %H:%M:%S").to_numpy(),
            "direction": np.where(inside[flip] == 1, "enter", "exit"),
        }
    )


def fence_transitions_state(events: DataFrame) -> DataFrame:
    """Per-user geofence transitions, emitted incrementally (append
    semantics: each transition appears exactly once, in the batch that
    contains its event)."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_fence,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
