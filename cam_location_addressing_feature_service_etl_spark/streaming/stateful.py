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
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
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


MAD_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("obs_day", StringType(), False),
        StructField("n_window", LongType(), False),
        StructField("day_value", DoubleType(), False),
        StructField("med_value", DoubleType(), False),
        StructField("mad_value", DoubleType(), False),
        StructField("is_outlier", BooleanType(), False),
        StructField("upd_seq", LongType(), False),
    ]
)

MAD_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType()), False),
        StructField("micros", ArrayType(LongType()), False),
        StructField("seq", LongType(), False),
    ]
)

_MAD_SCALE = 10**8  # micro-units matching the batch CAST(.. AS DECIMAL(18,8))

#: Default eviction horizon for ``rolling_mad_state``: one full MAD
#: window of lateness. A naive caller therefore gets BOUNDED per-user
#: state (lateness + W = 14 days) out of the box; unbounded retention
#: (``lateness_days=None``) is an explicit replay/backfill opt-in.
DEFAULT_MAD_LATENESS_DAYS = 7


def _lower_median(xs: list[int]) -> int:
    s = sorted(xs)
    return s[-(-len(s) // 2) - 1]  # order statistic ceil(n/2), 0-based


def _make_update_rolling_mad(lateness_days: int | None):
    """Build the per-group state-update function, closing over the
    eviction horizon. ``lateness_days=None`` retains every day forever
    (test/replay mode); with a value, days older than
    ``max(day) - lateness_days - W + 1`` are dropped after emission —
    they can no longer sit in the trailing window of any day that a
    watermark-admitted late event could still change, so state per
    user is bounded by lateness + W regardless of lifetime."""

    def _update_rolling_mad(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        yield from _update_rolling_mad_impl(key, pdfs, state, lateness_days)

    return _update_rolling_mad


def _update_rolling_mad_impl(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    lateness_days: int | None = None,
) -> Iterator[pd.DataFrame]:
    import bisect
    from datetime import date, timedelta
    from decimal import ROUND_HALF_UP, Decimal

    from ..workload.events import _MAD_K, _MAD_MIN_N, _MAD_WINDOW_DAYS

    (user_id,) = key
    days, micros, seq = state.get if state.exists else ([], [], 0)
    days, micros = list(days), list(micros)  # SORTED, parallel arrays
    changed: set[int] = set()
    batch: list[tuple[int, float]] = []
    for pdf in pdfs:
        batch.extend(
            (int(di), float(v))
            for di, v in zip(pdf["di"].astype("int64"), pdf["value"])
        )
    if lateness_days is not None and batch and days:
        # Authoritative straggler gate (the engine does NOT filter late
        # rows for applyInPandasWithState under NoTimeout): an event is
        # admitted iff its day >= PRE-batch per-user max day - lateness
        # — the same one-batch lag the engine watermark has, so a
        # backfill batch always folds whole. Every admitted event's
        # recompute window is intact: admitted d >= prev_max - lateness
        # means its window needs days >= prev_max - lateness - W + 1,
        # exactly what the previous batch's eviction retained.
        horizon = days[-1] - lateness_days
        batch = [(di, v) for di, v in batch if di >= horizon]
    for di, v in batch:
        # per-EVENT quantization mirrors the batch cast: Spark's
        # double->DECIMAL(18,8) goes through the shortest decimal
        # repr (BigDecimal.valueOf) then HALF_UP at 8 dp — so
        # Decimal(repr(v)), not Decimal(v)'s exact binary expansion
        q = Decimal(repr(v)).quantize(
            Decimal(1).scaleb(-8), rounding=ROUND_HALF_UP
        )
        i = bisect.bisect_left(days, di)
        if i < len(days) and days[i] == di:
            micros[i] += int(q.scaleb(8))
        else:
            days.insert(i, di)
            micros.insert(i, int(q.scaleb(8)))
        changed.add(di)
    seq += 1
    # a changed day dc shifts the trailing stats of every day in
    # [dc, dc + W-1]; the days are kept sorted so both the affected
    # set and each window rebuild are a bisect slice — O(log n + W)
    # per changed day, independent of how much history the user
    # retains (review-pass catch: the dict-scan version paid
    # O(|history|) per day)
    affected: set[int] = set()
    for dc in changed:
        lo = bisect.bisect_left(days, dc)
        hi = bisect.bisect_right(days, dc + _MAD_WINDOW_DAYS - 1)
        affected.update(days[lo:hi])
    out: dict[str, list] = {k.name: [] for k in MAD_OUTPUT_SCHEMA.fields}
    q4 = Decimal(1).scaleb(-4)

    def _emitf(micro: int) -> float:
        return float(
            Decimal(micro).scaleb(-8).quantize(q4, rounding=ROUND_HALF_UP)
        )

    for d in sorted(affected):
        lo = bisect.bisect_left(days, d - _MAD_WINDOW_DAYS + 1)
        hi = bisect.bisect_right(days, d)
        win = micros[lo:hi]
        med = _lower_median(win)
        mad = _lower_median([abs(x - med) for x in win])
        cur = micros[bisect.bisect_left(days, d)]
        dev = abs(cur - med)
        out["user_id"].append(user_id)
        out["obs_day"].append((date(1970, 1, 1) + timedelta(days=d)).isoformat())
        out["n_window"].append(len(win))
        out["day_value"].append(_emitf(cur))
        out["med_value"].append(_emitf(med))
        out["mad_value"].append(_emitf(mad))
        out["is_outlier"].append(len(win) >= _MAD_MIN_N and dev > _MAD_K * mad)
        out["upd_seq"].append(seq)
    # Evict AFTER emission (this batch's windows still see full
    # history) but BEFORE persisting: a day survives iff it can still
    # appear in the trailing window [dc - W + 1, dc] of a day dc the
    # watermark could still change (dc >= max - lateness).
    if lateness_days is not None and days:
        cutoff = days[-1] - lateness_days - _MAD_WINDOW_DAYS + 1
        keep = bisect.bisect_left(days, cutoff)
        if keep:
            days, micros = days[keep:], micros[keep:]
    state.update((days, micros, seq))
    yield pd.DataFrame(out)


def rolling_mad_state(
    events: DataFrame, lateness_days: int | None = DEFAULT_MAD_LATENESS_DAYS
) -> DataFrame:
    """Streaming leg of ``ev_rolling_mad_outliers``: per-user rolling
    lower-median/MAD outlier flags maintained across micro-batches.
    State is the user's (day -> exact micro-unit total) map; each
    batch folds its events in and RECOMPUTES only the days whose
    trailing window the new data touched ([dc, dc + W-1] per changed
    day dc — late data for an old day correctly re-flags the days
    downstream of it). All statistics are exact integer arithmetic on
    the same per-event DECIMAL(18,8) quantization the batch query
    uses, so the final emission per (user, day) is bit-identical to
    the batch result no matter where micro-batch boundaries fall
    (asserted in tests/test_stateful_streaming.py, split vs unsplit).

    Emission is update-mode: a day re-emits whenever its window
    changes; ``upd_seq`` (per-user batch counter) lets a consumer —
    and the reconciliation test — keep the latest row per (user, day).

    Scale: state is one shuffle on user_id per batch; per-user state
    is one long per retained day. ``lateness_days`` is the eviction
    dial: when set (the DEFAULT — ``DEFAULT_MAD_LATENESS_DAYS`` = one
    MAD window of lateness — so a naive caller gets bounded state),
    days older than ``max(day) - lateness_days - W + 1`` are evicted
    after each batch — they can no longer enter any recomputable
    window — so per-user state is bounded by lateness + W days
    regardless of lifetime. ``None`` is the explicit opt-in for
    unbounded retention: the replay/backfill mode where NO event is
    ever too late (the reconciliation tests exercise both; their data
    spans < default + W days so both modes are bit-identical there).

    BREAKING-DEFAULT NOTE (r10): the default changed from ``None``
    (unbounded) to ``DEFAULT_MAD_LATENESS_DAYS``. Any pre-r10 caller
    replaying feeds whose events lag a user's max day by more than
    lateness + W days now sees those stragglers dropped by the gate
    and must pass ``lateness_days=None`` explicitly. Call-site audit
    at the change: the only in-repo callers are the registered query
    (bounded feed) and the reconciliation tests, both unaffected.

    Lateness semantics are PER-USER, not the engine's global
    watermark: the straggler gate admits an event iff its day >= that
    user's own pre-batch max day - lateness. Because a user's max day
    never exceeds the global max, this is MORE permissive than a
    global gate for slow-moving users — a user who last advanced to
    day d still accepts backfill down to d - lateness even after
    faster users have pushed the global watermark far past it (the
    engine does not drop late rows before applyInPandasWithState
    under NoTimeout, so this gate is authoritative). The trade is
    deliberate for per-entity feeds that progress at different rates;
    a batch replay gated on the GLOBAL max would drop slow users'
    admitted backfill, so streaming output can diverge from such a
    replay — pinned by the two-user test in
    tests/test_stateful_streaming.py."""
    from ..session import _ship_package

    _ship_package(events.sparkSession)
    from pyspark.sql import functions as F

    if lateness_days is not None and events.isStreaming:
        # Eviction's correctness CONTRACT is that no event older than
        # the lateness horizon reaches state (an admitted straggler
        # would recompute its day against already-evicted history and
        # emit a permanently wrong row). Enforce the watermark here
        # rather than trusting every caller to remember the pairing
        # (review-pass catch).
        events = events.withWatermark("ts", f"{lateness_days} days")
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("di"),
            "value",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_rolling_mad(lateness_days),
            MAD_OUTPUT_SCHEMA,
            MAD_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
