"""Event-time-watermarked reorder buffer — the upstream stage every
ordering-contract stream in this package calls for (``streaming/
semdedup.py`` and ``streaming/ewma.py`` RAISE on out-of-order
sequence ids; this operator turns an out-of-order transport into the
ordered feed those contracts need, instead of asking every producer to
be perfectly ordered). GENERIC over the keyed stream: any key column,
any integral sequence column, any payload columns (scalars or arrays)
— the defaults are the SemDeDup feed's (cluster / vec_id / nv).

Semantic contract (the standard reorder-buffer bargain):

- Upstream assigns sequence ids in EVENT-TIME order (seq monotone in
  ``ts`` per key — ids minted at ingest); disorder is introduced by
  transport/shuffling, bounded by the watermark delay.
- A buffered row is RELEASED once the watermark passes its event time:
  any still-missing row with a smaller seq would (by monotonicity)
  carry an earlier ``ts``, i.e. be beyond the watermark — so releasing
  in seq order is safe, and released order never has to be revised.
- A row arriving AFTER its slot was released (seq at or below the
  key's released high-water mark — possible only by exceeding the
  lateness bound) is emitted flagged ``dropped_late`` rather than
  silently reordered-behind: the downstream operator's outputs for
  later ids are already out, so replaying it would be the silent
  divergence the ordering contracts exist to refuse. The flag leg
  makes the loss observable (count it, alert on it, widen the
  watermark).

Operator shape: ``applyInPandasWithState`` keyed by ``key_col`` with
EVENT-TIME TIMEOUT — the timeout is what flushes a key whose buffered
rows' release time has passed but which receives no further data
(without it a quiet key would buffer forever; a global watermark
advance, e.g. any other key's traffic, wakes it). State per key is the
buffered rows only — bounded by (arrival rate × lateness), the classic
reorder-buffer bound, NOT by stream length; released rows leave the
state immediately. The state and output schemas are DERIVED from the
input frame's payload column types at plan-construction time (array
payloads buffer as array-of-array state fields).

Composition: reorder and the downstream stateful operator are separate
streaming stages joined by a replayable sink (parquet here, a Kafka
topic at production scale) — the honest 100 TB layout, and it
sidesteps Spark's restrictions on chaining arbitrary stateful
operators inside one query. ``tests/test_streaming_reorder.py`` runs
the composed pipelines (out-of-order feed → reorder → semdedup, and →
ewma) and reconciles them exactly with the batch queries, pins the
beyond-lateness divergence case, and property-tests random bounded
disorder.
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
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the default (SemDeDup) feed shape plus the event time disorder is
#: bounded against: (vec_id, cluster, nv, ts)
TIMED_SCHEMA = "vec_id bigint, cluster bigint, nv array<double>, ts timestamp"

RELEASED = "released"
DROPPED_LATE = "dropped_late"


def _make_update(
    seq_col: str, ts_col: str, payload_cols: tuple[str, ...], out_names: list[str]
):
    n_payloads = len(payload_cols)

    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            st = state.get
            max_released = int(st[0])
            b_ids = list(st[1])
            b_ts = list(st[2])
            b_pay = [list(st[3 + i]) for i in range(n_payloads)]
        else:
            max_released = -1
            b_ids, b_ts = [], []
            b_pay = [[] for _ in range(n_payloads)]

        out_ids: list[int] = []
        out_status: list[str] = []
        out_pay: list[list] = [[] for _ in range(n_payloads)]

        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            seqs = pdf[seq_col].to_numpy(np.int64)
            # unit-robust epoch ms (pandas may deliver ns or us)
            ts_ms = (
                pd.to_datetime(pdf[ts_col])
                .to_numpy()
                .astype("datetime64[ms]")
                .astype(np.int64)
            )
            pay_vals = [pdf[p].tolist() for p in payload_cols]
            for r in range(len(pdf)):
                vid = int(seqs[r])
                vals = [
                    v.tolist() if hasattr(v, "tolist") else v
                    for v in (pay_vals[i][r] for i in range(n_payloads))
                ]
                if vid <= max_released:
                    # beyond-lateness: slot already released — flag,
                    # never re-buffer (module docstring)
                    out_ids.append(vid)
                    out_status.append(DROPPED_LATE)
                    for i in range(n_payloads):
                        out_pay[i].append(vals[i])
                else:
                    b_ids.append(vid)
                    b_ts.append(int(ts_ms[r]))
                    for i in range(n_payloads):
                        b_pay[i].append(vals[i])

        if b_ids:
            order = np.argsort(np.asarray(b_ids, dtype=np.int64), kind="stable")
            due = [i for i in order if b_ts[i] <= wm]
            if due:
                for i in due:
                    out_ids.append(b_ids[i])
                    out_status.append(RELEASED)
                    for p in range(n_payloads):
                        out_pay[p].append(b_pay[p][i])
                max_released = max(max_released, max(b_ids[i] for i in due))
                keep = [i for i in range(len(b_ids)) if b_ts[i] > wm]
                b_ids = [b_ids[i] for i in keep]
                b_ts = [b_ts[i] for i in keep]
                b_pay = [[bp[i] for i in keep] for bp in b_pay]

        state.update((int(max_released), b_ids, b_ts, *b_pay))
        if b_ids:
            # wake this key when the watermark passes its earliest
            # buffered row even with no new data (must be > watermark)
            state.setTimeoutTimestamp(max(min(b_ts), wm + 1))

        if out_ids:
            data = {out_names[0]: np.asarray(out_ids, dtype=np.int64)}
            data[out_names[1]] = [key_val] * len(out_ids)
            for i in range(n_payloads):
                data[out_names[2 + i]] = out_pay[i]
            data[out_names[-1]] = out_status
            yield pd.DataFrame(data)

    return _update


def reorder_stream(
    timed: DataFrame,
    lateness: str,
    key_col: str = "cluster",
    seq_col: str = "vec_id",
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("nv",),
    assume_watermarked: bool = False,
) -> DataFrame:
    """Buffer an out-of-order keyed stream and emit
    (seq, key, *payloads, status): rows whose event time the watermark
    has passed come out ``released`` in seq order per key; rows
    arriving beyond ``lateness`` (their slot already released) come
    out ``dropped_late``. Feed the released leg to the downstream
    ordering-contract operator — the contract holds by construction.

    ``assume_watermarked``: pass True when ``timed`` ALREADY carries a
    watermark on ``ts_col`` (e.g. it went through
    ``dropDuplicatesWithinWatermark`` upstream — the chained-stateful
    CDC pipeline of tests/test_streaming_pipeline_e2e.py); Spark
    forbids redefining a watermark, and the upstream one governs this
    operator's event-time timeouts identically as long as its delay is
    >= the disorder bound (``lateness`` is then unused)."""
    from ..session import _ship_package

    _ship_package(timed.sparkSession)
    in_fields = {f.name: f.dataType for f in timed.schema.fields}
    out_schema = StructType(
        [
            StructField(seq_col, LongType(), False),
            StructField(key_col, in_fields[key_col], False),
            *[
                StructField(p, in_fields[p], False)
                for p in payload_cols
            ],
            StructField("status", StringType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("max_released", LongType(), False),
            StructField("ids", ArrayType(LongType()), False),
            StructField("ts_ms", ArrayType(LongType()), False),
            *[
                StructField(f"p{i}", ArrayType(in_fields[p]), False)
                for i, p in enumerate(payload_cols)
            ],
        ]
    )
    select_cols = [seq_col, key_col, *payload_cols]
    if ts_col not in select_cols:  # ts may itself be a payload
        select_cols.append(ts_col)
    selected = timed.select(*select_cols)
    if not assume_watermarked:
        selected = selected.withWatermark(ts_col, lateness)
    return (
        selected
        .groupBy(key_col)
        .applyInPandasWithState(
            _make_update(
                seq_col,
                ts_col,
                tuple(payload_cols),
                [f.name for f in out_schema.fields],
            ),
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
