"""Stable dense surrogate-id assignment — SURVEY §2.9 M3, the one
algorithmically tricky operator in the reference.

Reference: ``address_etl/id_map.py:8-84`` appends unseen text PKs to a
``(id INTEGER AUTOINCREMENT, iri TEXT UNIQUE)`` map, then rewrites the
table's text PK to the integer id. Maps are carried across runs so ids
are *stable forever* (``main_pls.py:137-153``).

Spark-first design:

- new keys = ``left_anti`` against the existing map (tolerant of
  already-converted ids via the UNION trick, see ``new_key_filter``);
- ids = ``max(existing.id) + row_number() OVER (ORDER BY key)`` —
  deterministic, dense, stable. ``monotonically_increasing_id`` is
  explicitly avoided: it is neither dense nor stable across runs.

Scale: the incremental numbering ranks ONLY the *new* keys of one
increment (small by definition in an incremental ETL) on a single
reducer — via the windowless sorted-array rank of ``operators/topk``,
which does not spill. For a bulk first load at 100 TB use
``zipWithIndex``-free two-phase numbering: per-partition counts →
offsets broadcast → partition-local row_number + offset. Implemented
here as ``assign_surrogate_ids_bulk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .topk import ASC, prefix_sum_small_frame, rank_small_frame
from ..runtime import materialize


#: hard cap on new keys per increment for :func:`assign_surrogate_ids`
#: — the sorted-array rank holds the increment's new keys in ONE
#: in-memory array (no spill), so an unbounded caller must fail with a
#: clear message instead of an executor OOM.
MAX_INCREMENT_NEW_KEYS = 5_000_000


def assign_surrogate_ids(
    keys: DataFrame,
    existing_map: DataFrame,
    key_col: str = "iri",
    max_new_keys: int = MAX_INCREMENT_NEW_KEYS,
) -> DataFrame:
    """Return the full map (key_col, id) = existing ∪ newly-numbered keys.

    ``existing_map`` has columns (key_col, id: long). ``keys`` is the
    (possibly duplicated) key universe; only unseen keys get new ids,
    numbered max(id)+1.. in deterministic ``key_col`` order.

    INCREMENT-SIZED ONLY — enforced, not just documented: the new keys
    are ranked via a sorted-array aggregate that holds one increment's
    new keys in a single in-memory array (it does not spill), so the
    plan raises a clear error (lazily, at execution — plan build stays
    job-free) if the increment exceeds ``max_new_keys``. A first/bulk
    load — where EVERY key is new — must use
    :func:`assign_surrogate_ids_bulk` (identical ids, distributed
    spill-safe numbering); ``plans/pipeline.surrogate_id_pass`` does.
    """
    distinct_keys = keys.select(key_col).distinct()
    new_keys = distinct_keys.join(existing_map.select(key_col), key_col, "left_anti")
    start = existing_map.agg(F.coalesce(F.max("id"), F.lit(0)).alias("start"))
    # one increment's NEW keys only (small by definition — the bulk
    # variant below is the corpus-sized path, and unlike this
    # sorted-array rank it also spills): numbered windowless via
    # operators/topk.rank_small_frame, so no single-partition
    # WindowExec appears anywhere in an incremental run's plan.
    # Enforcement: limit(cap+1) BEFORE the rank bounds the collected
    # array itself (an after-the-fact count would OOM inside
    # collect_list before any check ran), then a rank at cap+1 proves
    # the increment overflowed and raises through a FILTER predicate —
    # a filter is part of the plan's row semantics, so unlike a guard
    # woven into a projected column it survives column pruning: even a
    # downstream count(*) or key-only projection that never evaluates
    # `id` still trips the error instead of silently seeing a
    # truncated map (caught by the round-8 review pass).
    guard = F.when(
        F.col("_rn") > F.lit(max_new_keys),
        F.raise_error(
            F.lit(
                f"assign_surrogate_ids: increment has more than {max_new_keys} "
                "new keys; route bulk/first loads through "
                "assign_surrogate_ids_bulk (distributed, spill-safe numbering)"
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    numbered = (
        rank_small_frame(
            new_keys.limit(max_new_keys + 1),
            [(F.col(key_col), ASC)],
            [key_col],
            rank_name="_rn",
        )
        .filter(guard)
        .crossJoin(F.broadcast(start))
        .select(
            key_col,
            (F.col("start") + F.col("_rn")).cast("long").alias("id"),
        )
    )
    return existing_map.select(key_col, "id").unionByName(numbered)


def assign_surrogate_ids_bulk(
    keys: DataFrame, existing_map: DataFrame, key_col: str = "iri"
) -> DataFrame:
    """Bulk variant: same contract as ``assign_surrogate_ids`` but the
    new-key numbering is distributed (no single-partition window).

    Two-phase: sort-repartition new keys by key (range partitioning),
    count per partition, prefix-sum the counts into per-partition
    offsets, then number partition-locally. Deterministic because range
    partitioning + in-partition sort give a total order by key.
    """
    distinct_keys = keys.select(key_col).distinct()
    # Materialize the range-partitioned sort ONCE: both the offset
    # aggregation and the numbering consume it, and lineage-cutting
    # here both avoids recomputing the subtree per branch and makes
    # spark_partition_id stability a guarantee rather than a
    # reuse-the-exchange accident.
    new_keys = (
        distinct_keys.join(existing_map.select(key_col), key_col, "left_anti")
        .repartitionByRange(F.col(key_col))
        .sortWithinPartitions(key_col)
        .transform(materialize)
    )
    # Lazy 1-row start frame (broadcast below) — a driver-side
    # collect() here would execute real jobs at PLAN-BUILD time, making
    # explain/plan-audit consumers pay full compute before any action.
    start = existing_map.agg(F.coalesce(F.max("id"), F.lit(0)).alias("_start"))

    # spark_partition_id is stable for a materialized partitioning; use
    # a window per partition id with a precomputed offset join.
    with_pid = new_keys.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Prefix-sum the per-partition counts into offsets WITHOUT a window
    # (the offsets frame is numPartitions rows; an empty-partition-spec
    # window would still plan as the warned single-partition
    # WindowExec): operators/topk.py's sorted-array prefix sum. O(P²)
    # scalar adds inside one row — fine to ~10k partitions; for extreme
    # partition counts do this prefix sum driver-side (the zipWithIndex
    # approach).
    offsets = prefix_sum_small_frame(
        counts,
        [(F.col("_pid"), ASC)],
        ["_pid"],
        sum_col="_cnt",
        sum_name="_off",
        inclusive=False,
    )
    w_local = Window.partitionBy("_pid").orderBy(key_col)
    numbered = (
        with_pid.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(start))
        .withColumn(
            "id",
            (F.col("_start") + F.col("_off") + F.row_number().over(w_local)).cast("long"),
        )
        .select(key_col, "id")
    )
    return existing_map.select(key_col, "id").unionByName(numbered)


def new_key_filter(table: DataFrame, existing_map: DataFrame, pk_col: str, key_col: str = "iri") -> DataFrame:
    """J7: ``pk NOT IN (SELECT iri FROM map UNION SELECT id FROM map)`` —
    new-key detection tolerant of already-converted integer ids
    (``address_etl/id_map.py:36-45``)."""
    known = (
        existing_map.select(F.col(key_col).cast("string").alias("k"))
        .union(existing_map.select(F.col("id").cast("string").alias("k")))
        .distinct()
    )
    return table.join(
        known, table[pk_col].cast("string") == known["k"], "left_anti"
    )


def rewrite_pk_to_id(table: DataFrame, id_map: DataFrame, pk_col: str, key_col: str = "iri") -> DataFrame:
    """M3 rewrite step: replace the text PK with the mapped integer id.

    Reference does this as a correlated-subquery UPDATE in 10k rowid
    batches (id_map.py:64-82); here it is one join producing a new
    immutable table.
    """
    rest = [c for c in table.columns if c != pk_col]
    return (
        table.join(id_map, table[pk_col] == id_map[key_col], "inner")
        .select(F.col("id").alias(pk_col), *rest)
    )
