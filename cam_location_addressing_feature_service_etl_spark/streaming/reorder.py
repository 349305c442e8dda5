"""Event-time-watermarked reorder buffer — the upstream stage the
streaming SemDeDup ordering contract calls for (``streaming/
semdedup.py`` RAISES on out-of-order vec_ids; this operator turns an
out-of-order transport into the id-ordered feed that contract needs,
instead of asking every producer to be perfectly ordered).

Semantic contract (the standard reorder-buffer bargain):

- Upstream assigns vec_ids in EVENT-TIME order (vec_id monotone in
  ``ts`` per cluster — ids minted at ingest); disorder is introduced
  by transport/shuffling, bounded by the watermark delay.
- A buffered row is RELEASED once the watermark passes its event time:
  any still-missing row with a smaller vec_id would (by monotonicity)
  carry an earlier ``ts``, i.e. be beyond the watermark — so releasing
  in vec_id order is safe, and released order never has to be revised.
- A row arriving AFTER its slot was released (vec_id at or below the
  cluster's released high-water mark — possible only by exceeding the
  lateness bound) is emitted flagged ``dropped_late`` rather than
  silently reordered-behind: the downstream keep-first flags for later
  ids are already out, so replaying it would be the silent divergence
  the SemDeDup contract exists to refuse. The flag leg makes the loss
  observable (count it, alert on it, widen the watermark).

Operator shape: ``applyInPandasWithState`` keyed by cluster with
EVENT-TIME TIMEOUT — the timeout is what flushes a cluster whose
buffered rows' release time has passed but which receives no further
data (without it a quiet key would buffer forever; a global watermark
advance, e.g. any other cluster's traffic, wakes it). State per key is
the buffered rows only — bounded by (arrival rate × lateness), the
classic reorder-buffer bound, NOT by stream length; released rows
leave the state immediately.

Composition: reorder and the stateful prune are separate streaming
stages joined by a replayable sink (parquet here, a Kafka topic at
production scale) — the honest 100 TB layout, and it sidesteps
Spark's restrictions on chaining arbitrary stateful operators inside
one query. ``tests/test_streaming_reorder.py`` runs the composed
pipeline (out-of-order feed → reorder → semdedup) and reconciles it
exactly with the batch ``sim_semdedup_prune`` flags, plus pins the
beyond-lateness divergence case.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the assigned-vector stream plus the event time disorder is bounded
#: against: (vec_id, cluster, nv, ts)
TIMED_SCHEMA = "vec_id bigint, cluster bigint, nv array<double>, ts timestamp"

OUTPUT_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("cluster", LongType(), False),
        StructField("nv", ArrayType(DoubleType()), False),
        StructField("status", StringType(), False),
    ]
)

RELEASED = "released"
DROPPED_LATE = "dropped_late"

#: buffered (not yet releasable) rows of the cluster plus the released
#: high-water mark: ids / event-time ms aligned by index, vectors as a
#: row-major flattened matrix (same layout as streaming/semdedup.py).
STATE_SCHEMA = StructType(
    [
        StructField("max_released", LongType(), False),
        StructField("ids", ArrayType(LongType()), False),
        StructField("ts_ms", ArrayType(LongType()), False),
        StructField("flat", ArrayType(DoubleType()), False),
        StructField("dim", LongType(), False),
    ]
)


def _reorder_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (cluster,) = key
    wm = state.getCurrentWatermarkMs()
    if state.exists:
        max_released, b_ids, b_ts, b_flat, b_dim = state.get
        b_ids = list(b_ids)
        b_ts = list(b_ts)
        buf = np.asarray(b_flat, dtype=np.float64).reshape(-1, int(b_dim))
        dim = int(b_dim)
    else:
        max_released, b_ids, b_ts, dim = -1, [], [], 0
        buf = np.zeros((0, 0), dtype=np.float64)

    out_ids: list[int] = []
    out_vecs: list[list[float]] = []
    out_status: list[str] = []

    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        new_vecs = np.vstack(pdf["nv"].to_numpy()).astype(np.float64)
        if dim == 0:
            dim = new_vecs.shape[1]
            buf = buf.reshape(0, dim)
        # unit-robust epoch ms (pandas may deliver ns or us datetimes)
        ts_ms = (
            pd.to_datetime(pdf["ts"])
            .to_numpy()
            .astype("datetime64[ms]")
            .astype(np.int64)
        )
        vids = pdf["vec_id"].to_numpy(np.int64)
        # beyond-lateness: slot already released — flag, never
        # re-buffer (module docstring)
        late = vids <= max_released
        for i in np.flatnonzero(late):
            out_ids.append(int(vids[i]))
            out_vecs.append(new_vecs[i].tolist())
            out_status.append(DROPPED_LATE)
        b_ids.extend(int(v) for v in vids[~late])
        b_ts.extend(int(t) for t in ts_ms[~late])
        buf = np.vstack([buf, new_vecs[~late]])

    if b_ids:
        order = np.argsort(np.asarray(b_ids, dtype=np.int64), kind="stable")
        due = [i for i in order if b_ts[i] <= wm]
        if due:
            for i in due:
                out_ids.append(b_ids[i])
                out_vecs.append(buf[i].tolist())
                out_status.append(RELEASED)
            max_released = max(max_released, max(b_ids[i] for i in due))
            keep = [i for i in range(len(b_ids)) if b_ts[i] > wm]
            b_ids = [b_ids[i] for i in keep]
            b_ts = [b_ts[i] for i in keep]
            buf = buf[keep] if keep else buf[:0]

    state.update((int(max_released), b_ids, b_ts, buf.ravel().tolist(), dim))
    if b_ids:
        # wake this key when the watermark passes its earliest buffered
        # row even if no more data arrives for it (must be > watermark)
        state.setTimeoutTimestamp(max(min(b_ts), wm + 1))

    if out_ids:
        yield pd.DataFrame(
            {
                "vec_id": np.asarray(out_ids, dtype=np.int64),
                "cluster": np.full(len(out_ids), np.int64(cluster)),
                "nv": out_vecs,
                "status": out_status,
            }
        )


def reorder_stream(timed: DataFrame, lateness: str) -> DataFrame:
    """Buffer an out-of-order assigned-vector stream (``TIMED_SCHEMA``)
    and emit (vec_id, cluster, nv, status): rows whose event time the
    watermark has passed come out ``released`` in vec_id order per
    cluster; rows arriving beyond ``lateness`` (their slot already
    released) come out ``dropped_late``. Feed the released leg to
    ``semdedup_stream`` — its ordering contract holds by construction."""
    from ..session import _ship_package

    _ship_package(timed.sparkSession)
    return (
        timed.select("vec_id", "cluster", "nv", "ts")
        .withWatermark("ts", lateness)
        .groupBy("cluster")
        .applyInPandasWithState(
            _reorder_update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
