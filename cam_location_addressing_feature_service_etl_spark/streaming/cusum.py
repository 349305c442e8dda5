"""Streaming per-user CUSUM drift detection — the stateful twin of the
batch ``ev_cusum_drift`` (r12 verdict #5), with O(1) state per key by
the SAME reflection identity the batch leg uses to become two codegen
windows: S_t = C_t − min(0, min_{j≤t} C_j), where C is the plain
prefix sum of the centi-quantized deviations (x − k). The entire
memory of that recurrence is two integers — the running prefix sum
``cum`` and the running floor ``min(0, min prefix)`` — so the state
never grows with stream length and the emitted statistic is EXACT
integer arithmetic, bit-equal to the batch windows over any
micro-batch split (``tests/test_streaming_cusum.py``, including
split-replay).

Ordering contract (the ``streaming/ewma.py`` discipline, same remedy):
the statistic is defined by (ts, event_id) order, so per-user events
must arrive nondecreasing across micro-batches — the kernel sorts
within a batch and RAISES on a cross-batch violation rather than
emitting a silently-wrong alarm sequence; an out-of-order transport
composes ``streaming/reorder.py`` in front.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from ..workload.events import _CUSUM_H, _CUSUM_K

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("cusum_centi", LongType(), False),
        StructField("alarm", BooleanType(), False),
    ]
)

#: O(1) per key: ordering high-water mark + the recurrence's two
#: integers (prefix sum, running floor = min(0, min prefix))
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), False),
        StructField("last_eid", LongType(), False),
        StructField("cum", LongType(), False),
        StructField("floor_min", LongType(), False),
    ]
)


def _update_cusum(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    chunks = [c for c in pdfs if len(c)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        ["ts", "event_id"], ignore_index=True
    )
    ts_ns = (
        pd.to_datetime(pdf["ts"]).to_numpy().astype("datetime64[ns]").astype(np.int64)
    )
    eids = pdf["event_id"].to_numpy(np.int64)
    if state.exists:
        last_ts, last_eid, cum0, floor0 = state.get
        if (int(ts_ns[0]), int(eids[0])) <= (int(last_ts), int(last_eid)):
            raise ValueError(
                f"cusum_stream ordering contract violated for user "
                f"{user_id}: event ({int(ts_ns[0])}, {int(eids[0])}) "
                f"arrived after ({int(last_ts)}, {int(last_eid)}); feed a "
                f"(ts, event_id)-ordered stream or add an upstream "
                f"reorder buffer (streaming/reorder.py pattern)"
            )
    else:
        cum0, floor0 = 0, 0
    d = (
        np.floor(pdf["value"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
        - _CUSUM_K
    )
    cums = cum0 + np.cumsum(d)
    # running floor: min(0, min prefix C) — floor0 starts at 0, so the
    # 0 is absorbed once and the accumulate keeps it exact thereafter
    floor = np.minimum(np.minimum.accumulate(cums), floor0)
    cusum = cums - floor
    state.update((int(ts_ns[-1]), int(eids[-1]), int(cums[-1]), int(floor[-1])))
    yield pd.DataFrame(
        {
            "event_id": eids,
            "user_id": np.full(len(eids), np.int64(user_id)),
            "cusum_centi": cusum,
            "alarm": cusum > _CUSUM_H,
        }
    )


def cusum_stream(events: DataFrame) -> DataFrame:
    """Per-user streaming CUSUM over an (event_id, ts, user_id, value)
    stream: emits each event's exact statistic + alarm flag once, in
    the batch that delivered it (append semantics — under the ordering
    contract the statistic never changes retroactively)."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cusum,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
