"""Incremental entity resolution reconciles EXACTLY with the one-shot
composite: folding the master registry batch-by-batch through
er_resolve_increment — new names PassJoined against the accumulated
vocabulary only, touched components merged via a bounded re-label —
lands on the same (name, label, entity_key) registry and the same
resolved links as er_resolve_entities run from zero, regardless of how
the masters are batched (order independence). Plus: the cross-batch
bridge case (a late name merging two existing components) and
foreachBatch replay idempotency of the streaming fold."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.er import (
    fold_master_batch,
    read_master_stream,
    read_registry,
    resolve_registry_stream,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _ER_FEED_SQL,
    _LINK_BLOCK_STRATEGIES,
    _LINK_TAU,
    _er_masters,
    er_empty_registry,
    er_resolve_increment,
    link_feed_to_masters,
)
from cam_location_addressing_feature_service_etl_spark.tables import load

from tests.conftest import SF_SMOKE


def _fold_in_batches(spark, m, n_batches):
    registry = er_empty_registry(spark)
    for i in range(n_batches):
        batch = m.filter(F.col("mk") % n_batches == i)
        registry = er_resolve_increment(registry, batch).localCheckpoint()
    return registry


def _link_through(m, feed, registry):
    links = link_feed_to_masters(
        m, feed, _LINK_TAU, block_keys=_LINK_BLOCK_STRATEGIES
    ).select("feed_key", "master_key")
    m2 = m.select(F.col("mk").alias("mk2"), F.col("mn").alias("mn2"))
    reg = registry.select(
        F.col("nm").alias("nm2"), F.col("entity_key").alias("entity_key")
    )
    return (
        links.join(m2, links["master_key"] == m2["mk2"])
        .join(reg, m2["mn2"] == reg["nm2"])
        .select("feed_key", "master_key", "entity_key")
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_links_reconcile_with_oneshot(spark):
    """The verdict's done-bar: multi-batch replay of the registry fold,
    then linking the dirty feed THROUGH the incremental registry,
    reproduces er_resolve_entities exactly."""
    part = load(spark, SF_SMOKE, "part")
    m = _er_masters(part).localCheckpoint()
    feed = part.select(
        F.col("p_partkey").alias("fk"), F.expr(_ER_FEED_SQL).alias("fn")
    )
    registry = _fold_in_batches(spark, m, 3)
    got = _rows(_link_through(m, feed, registry))
    want = _rows(QUERIES["er_resolve_entities"](spark, SF_SMOKE))
    assert got == want and len(want) > 0


def test_batching_is_order_independent(spark):
    """2-batch and 4-batch folds land on the identical registry —
    connectivity (and min-label / min-key folding) does not depend on
    arrival order."""
    m = _er_masters(load(spark, SF_SMOKE, "part")).localCheckpoint()
    r2 = _rows(_fold_in_batches(spark, m, 2))
    r4 = _rows(_fold_in_batches(spark, m, 4))
    assert r2 == r4 and len(r2) > 0


def test_cross_batch_bridge_merges_components(spark):
    """The bounded re-label path, isolated: two names too far apart to
    link directly (distance 3 > tau=2) arrive in separate batches and
    stay distinct components; a THIRD batch's bridge name (within tau
    of both) merges them — label collapses to the component-minimum
    name, entity key to the minimum master key, without any from-zero
    re-resolution."""
    mk_mn = "mk bigint, mn string"
    b0 = spark.createDataFrame([(7, "ab cdxxx")], mk_mn)
    b1 = spark.createDataFrame([(5, "ab cdyyy")], mk_mn)
    bridge = spark.createDataFrame([(9, "ab cdxyy")], mk_mn)

    registry = er_resolve_increment(er_empty_registry(spark), b0)
    registry = er_resolve_increment(registry, b1).localCheckpoint()
    two = {r["nm"]: (r["label"], r["entity_key"]) for r in registry.collect()}
    assert two == {
        "ab cdxxx": ("ab cdxxx", 7),
        "ab cdyyy": ("ab cdyyy", 5),
    }

    merged = er_resolve_increment(registry, bridge)
    got = {r["nm"]: (r["label"], r["entity_key"]) for r in merged.collect()}
    assert got == {
        "ab cdxxx": ("ab cdxxx", 5),
        "ab cdyyy": ("ab cdxxx", 5),
        "ab cdxyy": ("ab cdxxx", 5),
    }


def test_existing_name_in_new_batch_lowers_entity_key(spark):
    """A batch row carrying an ALREADY-KNOWN name adds no vocabulary
    and no edges, but its smaller master key must still lower the
    component's entity key (the min-merge leg)."""
    mk_mn = "mk bigint, mn string"
    registry = er_resolve_increment(
        er_empty_registry(spark),
        spark.createDataFrame([(40, "pq rstu")], mk_mn),
    ).localCheckpoint()
    again = er_resolve_increment(
        registry, spark.createDataFrame([(12, "pq rstu")], mk_mn)
    )
    assert _rows(again) == {("pq rstu", "pq rstu", 12)}


def test_streaming_fold_replay_is_idempotent(spark, tmp_path):
    m = _er_masters(load(spark, SF_SMOKE, "part")).localCheckpoint()
    reg_dir = str(tmp_path / "registry")
    batches = [m.filter(F.col("mk") % 3 == i) for i in range(3)]
    for bid, b in enumerate(batches):
        fold_master_batch(b, bid, reg_dir)
    committed = _rows(read_registry(spark, reg_dir))
    fold_master_batch(batches[2], 2, reg_dir)  # foreachBatch replay
    assert _rows(read_registry(spark, reg_dir)) == committed
    want = _rows(QUERIES["er_incremental_registry"](spark, SF_SMOKE))
    assert committed == want and len(want) > 0


def test_streaming_registry_stream_reconciles(spark, tmp_path):
    """End to end through writeStream/foreachBatch: a file-source
    master stream (one file per micro-batch) accretes into the
    versioned registry; the final state equals the batch query (and
    hence, by its oracle, the converged one-shot resolution)."""
    m = _er_masters(load(spark, SF_SMOKE, "part")).localCheckpoint()
    d = tmp_path / "masters_in"
    d.mkdir()
    now = 1_700_000_000
    for i in range(3):
        f = d / f"b{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(
                m.filter(F.col("mk") % 3 == i).toPandas(),
                preserve_index=False,
            ),
            f,
        )
        os.utime(f, (now + 60 * i, now + 60 * i))
    reg_dir = str(tmp_path / "registry")
    q = resolve_registry_stream(
        read_master_stream(spark, str(d), max_files_per_trigger=1),
        reg_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = _rows(read_registry(spark, reg_dir))
    want = _rows(QUERIES["er_incremental_registry"](spark, SF_SMOKE))
    assert got == want and len(want) > 0


def test_stream_threads_linkage_knobs(spark, tmp_path):
    """resolve_registry_stream must pass tau/block_keys/retain_versions
    through to fold_master_batch (r12 ADVICE: the inner _apply used to
    drop them): with tau=1 two names at Levenshtein distance 2 stay
    separate entities, where the default tau=2 run merges them."""
    pdf = pa.Table.from_pylist(
        [{"mk": 1, "mn": "ab cdxx"}, {"mk": 2, "mn": "ab cdyy"}],
        schema=pa.schema([("mk", pa.int64()), ("mn", pa.string())]),
    )
    d = tmp_path / "masters_in"
    d.mkdir()
    pq.write_table(pdf, d / "b0.parquet")
    reg_dir = str(tmp_path / "registry")
    q = resolve_registry_stream(
        read_master_stream(spark, str(d)),
        reg_dir,
        str(tmp_path / "ckpt"),
        tau=1,
        retain_versions=2,
    )
    q.awaitTermination(120)
    got = _rows(read_registry(spark, reg_dir))
    assert got == {("ab cdxx", "ab cdxx", 1), ("ab cdyy", "ab cdyy", 2)}


def test_empty_batch_is_identity(spark, tmp_path):
    """foreachBatch delivers EMPTY micro-batches under availableNow
    triggers with no new files — the fold must be an identity, not an
    error and not a state reset."""
    mk_mn = "mk bigint, mn string"
    registry = er_resolve_increment(
        er_empty_registry(spark),
        spark.createDataFrame([(3, "xy zw"), (4, "ab cd")], mk_mn),
    ).localCheckpoint()
    before = _rows(registry)
    after = er_resolve_increment(
        registry, spark.createDataFrame([], mk_mn)
    )
    assert _rows(after) == before and len(before) == 2
