"""Streaming SemDeDup reconciles EXACTLY with the batch query when the
feed honors the vec_id ordering contract: a 2-batch vec_id-ordered
split and a single-batch replay both emit the keep-first flag set that
sim_semdedup_prune computes on the full corpus — including prunes
whose earlier near-duplicate arrived in a PREVIOUS micro-batch (the
carried-state case) and prunes against vectors that were themselves
pruned (the prune-vs-all-prior semantic)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.semdedup import (
    read_assigned_stream,
    semdedup_stream,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
    _SEMDEDUP_TAU,
)

from tests.conftest import SF_SMOKE


def _assigned_pdf(spark):
    """The exact assigned+normalized frame the batch query prunes."""
    from cam_location_addressing_feature_service_etl_spark.operators.kmeans import (
        lloyd,
    )
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        as_double_array,
        normalized_col,
    )
    from cam_location_addressing_feature_service_etl_spark.tables import load

    embeddings = load(spark, SF_SMOKE, "embeddings")
    assigns = lloyd(embeddings, k=8, iterations=2, round_digits=6)
    nv = embeddings.select(
        "vec_id", normalized_col(as_double_array(F.col("embedding"))).alias("nv")
    )
    return (
        assigns.join(nv, "vec_id")
        .select("vec_id", "cluster", "nv")
        .toPandas()
        .sort_values("vec_id")
    )


def _run_stream(spark, feed_dir, name, max_files):
    stream = read_assigned_stream(spark, str(feed_dir), max_files)
    q = (
        semdedup_stream(stream, _SEMDEDUP_TAU)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in spark.table(name).collect()
    }


def test_semdedup_stream_reconciles_with_batch(spark, tmp_path):
    d = tmp_path / "vec_in"
    d.mkdir()
    pdf = _assigned_pdf(spark)
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    half = t.num_rows // 2
    b1, b2 = d / "b1.parquet", d / "b2.parquet"
    pq.write_table(t.slice(0, half), b1)  # vec_id-ordered split
    pq.write_table(t.slice(half), b2)
    now = 1_700_000_000
    os.utime(b1, (now, now))
    os.utime(b2, (now + 60, now + 60))

    want = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in QUERIES["sim_semdedup_prune"](spark, SF_SMOKE).collect()
    }
    assert len(want) == t.num_rows
    n_pruned = sum(1 for _, _, kept in want if not kept)
    assert n_pruned > 0

    # the split must actually exercise carried state: some second-half
    # vector is pruned ONLY because of a first-half near-duplicate (no
    # smaller second-half vector of its cluster clears tau) — without
    # state carry the stream would emit it kept and mismatch
    import numpy as np

    first_ids = set(pdf["vec_id"].iloc[:half])
    by_id = {
        int(r.vec_id): (int(r.cluster), np.asarray(r.nv, dtype=np.float64))
        for r in pdf.itertuples()
    }
    state_only_prunes = 0
    for v, _, kept in want:
        if kept or v in first_ids:
            continue
        c, e = by_id[v]
        in_batch = any(
            round(float(e @ by_id[u][1]), 6) >= _SEMDEDUP_TAU
            for u in by_id
            if u < v and u not in first_ids and by_id[u][0] == c
        )
        if not in_batch:
            state_only_prunes += 1
    assert state_only_prunes > 0, (
        "no state-only cross-batch prune — split too shallow to prove "
        "state carry"
    )

    got_split = _run_stream(spark, d, "semdedup_split", max_files=1)
    assert got_split == want

    got_single = _run_stream(spark, d, "semdedup_single", max_files=None)
    assert got_single == want


def test_semdedup_stream_rejects_out_of_order_feed(spark, tmp_path):
    """The ordering contract is ENFORCED: a batch whose vec_ids are
    not beyond the cluster's seen max must kill the query (silent
    divergence from the batch flags is the failure mode being
    refused)."""
    import numpy as np
    import pandas as pd
    import pytest

    d = tmp_path / "vec_ooo"
    d.mkdir()
    vec = [1.0] + [0.0] * 7

    def write(name, ids, mtime):
        pdf = pd.DataFrame(
            {"vec_id": np.int64(ids), "cluster": np.int64([0] * len(ids)),
             "nv": [vec] * len(ids)}
        )
        f = d / name
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (mtime, mtime))

    now = 1_700_000_000
    write("b1.parquet", [10, 11], now)        # first batch: up to id 11
    write("b2.parquet", [5], now + 60)        # then id 5 arrives — late

    stream = read_assigned_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        semdedup_stream(stream, _SEMDEDUP_TAU)
        .writeStream.format("memory")
        .queryName("semdedup_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="ordering contract violated"):
        q.awaitTermination(180)


def test_semdedup_stream_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: stop the query after batch 1, deliver the
    second half, restart with the SAME checkpoint — the rebuilt query
    must recover the per-cluster vector state from the state store
    (not reprocess batch 1) and still emit exactly the batch flags:
    second-half prunes against first-half near-dups prove the state
    crossed the restart."""
    d = tmp_path / "vec_restart"
    d.mkdir()
    pdf = _assigned_pdf(spark)
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    half = t.num_rows // 2
    now = 1_700_000_000
    b1 = d / "b1.parquet"
    pq.write_table(t.slice(0, half), b1)
    os.utime(b1, (now, now))

    ckpt = str(tmp_path / "ckpt_restart")
    sink = str(tmp_path / "flags_restart")

    def run_once():
        # memory sink refuses checkpoint recovery; a foreachBatch
        # parquet append is the recoverable-sink shape
        def _emit(batch, _bid):
            batch.write.mode("append").parquet(sink)

        stream = read_assigned_stream(spark, str(d))
        q = (
            semdedup_stream(stream, _SEMDEDUP_TAU)
            .writeStream.foreachBatch(_emit)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["vec_id"], r["cluster"], r["kept"])
            for r in spark.read.parquet(sink).collect()
        }

    got1 = run_once()
    assert len(got1) == half

    b2 = d / "b2.parquet"
    pq.write_table(t.slice(half), b2)
    os.utime(b2, (now + 60, now + 60))
    got2 = run_once()  # fresh query, same checkpoint + sink
    # raw row count (not set) proves batch 1 was NOT reprocessed: a
    # replay would append duplicate flag rows
    assert spark.read.parquet(sink).count() == t.num_rows
    assert got1 < got2

    want = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in QUERIES["sim_semdedup_prune"](spark, SF_SMOKE).collect()
    }
    assert got2 == want
