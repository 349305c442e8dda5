"""Spark 4 ``transformWithState`` — the successor stateful-operator
API, exercised as a TWIN of ``streaming/stateful.py
running_user_totals`` (same semantics, same emissions) so the two APIs
are pinned against each other.

Why it exists alongside applyInPandasWithState: transformWithState is
the API Spark is consolidating arbitrary stateful processing on —
typed state VARIABLES (value/list/map) instead of one monolithic state
tuple, state TTL, timers registered per key rather than one timeout
mode for the whole operator, schema evolution of state, and an
initial-state handoff. For this operator the value-state form is a
drop-in; operators that juggle several state shapes (the reorder
buffer's ids/timestamps/payloads, semdedup's matrix + high-water mark)
map onto separate typed variables instead of packed tuples, which is
where the new API stops being syntax and starts being design.

Runtime requirements: transformWithState runs on the RocksDB state
store provider. ``running_user_totals_tws`` does NOT set it — a plan
builder silently flipping a session-wide config would switch the
state-store provider (and on-disk state format) of every subsequently
started streaming query. Callers opt in explicitly, either with their
own session config or scoped via the ``rocksdb_state_provider``
context manager (snapshot → set → restore); the builder asserts and
raises with that instruction when the provider is wrong. At scale
RocksDB is what you run anyway. The state-server protocol also needs
the ``protobuf`` package
(``google.protobuf``), which this container does NOT ship — the
reconciliation test skips via ``pytest.importorskip`` when absent
(same stub-behind-availability discipline as the Pillow image kernel,
``operators/multimodal.py``). The operator code itself is complete;
on an environment with protobuf the test runs end to end.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user cumulative (count, value sum) — the value-state form
    of the applyInPandasWithState twin's packed tuple."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        prior = self._totals.get()
        n, total = (int(prior[0]), float(prior[1])) if prior else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    def close(self) -> None:
        pass


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def rocksdb_state_provider(spark: SparkSession):
    """Scope the RocksDB state-store provider to a ``with`` block:
    snapshot the prior provider, set RocksDB, restore (or unset) on
    exit — so opting one transformWithState query in never silently
    changes the provider (and on-disk state format) of every other
    streaming query started later in the session."""
    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield spark
    finally:
        if prior is not None:
            spark.conf.set(_PROVIDER_KEY, prior)
        else:
            spark.conf.unset(_PROVIDER_KEY)


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of ``running_user_totals``:
    emits each batch's updated per-user totals. Requires the RocksDB
    state store provider but does NOT set it (a session-wide config
    flip would leak into every later streaming query) — start the
    query inside ``rocksdb_state_provider(spark)`` or configure the
    session yourself; raises otherwise."""
    current = events.sparkSession.conf.get(_PROVIDER_KEY, None)
    if current != _ROCKSDB:
        raise RuntimeError(
            "transformWithState requires the RocksDB state store "
            f"provider; {_PROVIDER_KEY} is {current!r}. Wrap the query "
            "in rocksdb_state_provider(spark) (scoped set + restore) "
            "or configure the session explicitly."
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
