"""Upsert (merge) semantics as pure-DataFrame rewrites — SURVEY §2.9.

The reference upserts row-at-a-time into SQLite:

- M1 ``INSERT ... ON CONFLICT(key) DO UPDATE`` last-write-wins
  (``address_etl/address_iri_pid_map.py:121-137``,
  ``address_etl/geocode.py:104-120``);
- M2 check-then-upsert that *resets* an enrichment column to NULL when
  an existing row is updated (``address_etl/geocode.py:231-270``; the
  same reset happens on snapshot carry-forward, ``main_pls.py:123-133``).

Spark-first: both are one distributed anti-join + union. At scale the
anti-join shuffles on the key once; with a small update set Catalyst
broadcast-hash-joins it (AQE demotes automatically when it is not).
No Delta dependency needed — output is an immutable new snapshot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_by_key(base: DataFrame, updates: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """M1: last-write-wins merge. ``updates`` must share ``base``'s schema.

    Equivalent to ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``:
    keep every update row; keep base rows whose key has no update.
    """
    key_cols = list(key_cols)
    untouched = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return updates.unionByName(untouched)


def upsert_with_reset(
    base: DataFrame,
    incoming: DataFrame,
    key_cols: Sequence[str],
    reset_cols: Sequence[str],
) -> DataFrame:
    """M2: merge where updated rows get ``reset_cols`` forced to NULL.

    ``incoming`` carries the non-reset payload columns only; reset
    columns are re-derived as NULL with the base's type (the reference
    nulls ``site_id`` so the later update-join re-enriches it).
    """
    key_cols = list(key_cols)
    base_types = dict(base.dtypes)
    updated = incoming.select(
        *[F.col(c) for c in incoming.columns],
        *[F.lit(None).cast(base_types[c]).alias(c) for c in reset_cols],
    ).select(*base.columns)
    untouched = base.join(incoming.select(*key_cols), key_cols, "left_anti")
    return updated.unionByName(untouched)
