"""The streaming bucket-sketch leg must reconcile with the batch
sliding-distinct query: sketches maintained incrementally across
micro-batches, unioned batch-side per sliding window, must (a) be
bit-identical to batch-built sketches (HLL registers are order-
insensitive maxima, so micro-batch splits cannot change them) and
(b) land within the 5% contract of the exact distinct counts the
batch query verifies against its oracle."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    read_event_stream,
    tumbling_distinct_sketches,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.events import (
    _SLD_BUCKET_MS,
    _SLD_SPAN,
)
from tests.conftest import SF_SMOKE



def _split_replay_dir(spark, tmp_path, batch_events):
    """Write the events as TWO parquet files split at the median
    event_id; with maxFilesPerTrigger=1 the replay crosses a real
    micro-batch boundary, so cross-batch state merging is exercised."""
    d = tmp_path / "stream_in"
    d.mkdir()
    mid = batch_events.approxQuantile("event_id", [0.5], 0.0)[0]
    for name, pred in [
        ("a", F.col("event_id") <= mid),
        ("b", F.col("event_id") > mid),
    ]:
        out = tmp_path / f"half_{name}"
        batch_events.filter(pred).coalesce(1).write.parquet(str(out))
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, d / f"{name}.parquet")
    return d


def test_streaming_bucket_sketches_union_to_sliding_windows(spark, tmp_path):
    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)

    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    bucket_str = f"{_SLD_BUCKET_MS // 60000} minutes"
    q = (
        tumbling_distinct_sketches(raw, bucket=bucket_str)
        .writeStream.format("memory")
        .queryName("hll_buckets")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sk = spark.table("hll_buckets").select(
        (F.unix_millis("bucket_start") / _SLD_BUCKET_MS).cast("long").alias("b"),
        "sk",
    )
    # batch-built sketches over the same events: bit-identical
    batch_sk = batch_events.groupBy(
        F.floor(F.unix_millis("ts") / F.lit(_SLD_BUCKET_MS)).cast("long").alias("b")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"))
    merged = sk.alias("s").join(batch_sk.alias("t"), "b", "full")
    diff = merged.filter(
        F.col("s.sk").isNull()
        | F.col("t.sk").isNull()
        | (
            F.hll_sketch_estimate(F.col("s.sk"))
            != F.hll_sketch_estimate(F.col("t.sk"))
        )
    ).count()
    assert diff == 0, "streaming sketches diverge from batch sketches"

    # union the streamed sketches per sliding window (the rollup query)
    buckets = sk.select("b").distinct()
    est = (
        sk.select(
            "sk",
            F.explode(F.sequence(F.col("b"), F.col("b") + (_SLD_SPAN - 1))).alias("wb"),
        )
        .join(buckets.select(F.col("b").alias("wb")), "wb", "leftsemi")
        .groupBy("wb")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = {
        r["window_bucket"]: r["exact_users"]
        for r in QUERIES["ev_sliding_distinct_hll"](spark, SF_SMOKE).collect()
    }
    got = {r["wb"]: r["est"] for r in est.collect()}
    assert set(got) == set(exact)
    for wb, e in exact.items():
        assert abs(got[wb] - e) <= 0.05 * e, (wb, got[wb], e)


def test_streaming_session_window_reconciles_to_batch(spark, tmp_path):
    """The native session_window aggregation runs UNCHANGED as a
    streaming query (state-store session merges) — replaying the
    events as two micro-batches must produce exactly the batch
    query's sessions."""
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _GAP_MIN,
    )

    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)

    raw = read_event_stream(spark, str(d), max_files_per_trigger=1).withWatermark(
        "ts", "1 hour"
    )
    stream = (
        raw.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,8)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.table("native_sessions")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    expect = (
        QUERIES["ev_sessionize_native_window"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert got[cols].values.tolist() == expect[cols].values.tolist()


def test_streaming_theta_sketches_reconcile_bit_identical(spark, tmp_path):
    """Theta state maintained across micro-batches must be
    bit-identical to the batch build (theta retains the k smallest
    hashes of the input SET — order- and duplicate-insensitive), and
    the pair algebra over the streamed state must reproduce the batch
    a10 intersection/union estimates exactly."""
    from cam_location_addressing_feature_service_etl_spark.streaming.events import (
        streaming_type_theta_sketches,
    )

    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)
    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        streaming_type_theta_sketches(raw)
        .writeStream.format("memory")
        .queryName("theta_types")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.table("theta_types")

    batch_sk = batch_events.groupBy("event_type").agg(
        F.theta_sketch_agg(F.col("user_id"), lgNomEntries=16).alias("sk")
    )
    per_type_diff = (
        streamed.alias("s")
        .join(batch_sk.alias("t"), "event_type", "full")
        .filter(
            F.col("s.sk").isNull()
            | F.col("t.sk").isNull()
            # BYTE equality — the actual bit-identical contract, not
            # the weaker estimate equality (review-pass catch)
            | (F.col("s.sk") != F.col("t.sk"))
        )
        .count()
    )
    assert per_type_diff == 0, "streamed theta state diverges from batch build"

    def pair_algebra(sk):
        sa = sk.select(
            F.col("event_type").alias("ta"), F.col("sk").alias("ska")
        )
        sb = sk.select(
            F.col("event_type").alias("tb"), F.col("sk").alias("skb")
        )
        return (
            sa.join(F.broadcast(sb), F.col("ta") < F.col("tb"))
            .select(
                "ta",
                "tb",
                F.theta_sketch_estimate(
                    F.expr("theta_intersection(ska, skb)")
                ).alias("inter"),
                F.theta_sketch_estimate(F.expr("theta_union(ska, skb)")).alias(
                    "uni"
                ),
            )
        )

    got = {
        (r["ta"], r["tb"]): (r["inter"], r["uni"])
        for r in pair_algebra(streamed).collect()
    }
    expect = {
        (r["ta"], r["tb"]): (r["inter"], r["uni"])
        for r in pair_algebra(batch_sk).collect()
    }
    assert got == expect


def test_streaming_kll_states_fold_within_rank_band(spark, tmp_path):
    """KLL compaction is order-sensitive, so a micro-batch split may
    change sketch BYTES — the split-insensitive contract is rank-space:
    the folded streaming states retain the exact total count n, and
    value-at-rank-q lands between the exact percentiles at q±tol (the
    same band the batch a11 query verifies against its oracle)."""
    from cam_location_addressing_feature_service_etl_spark.streaming.events import (
        tumbling_value_quantile_sketches,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _KLL_QS,
        _KLL_RANK_TOL,
    )

    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)
    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        tumbling_value_quantile_sketches(raw)
        .writeStream.format("memory")
        .queryName("kll_days")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    merged = (
        spark.table("kll_days")
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            F.expr(
                "CASE WHEN size(sks) = 0 THEN NULL ELSE "
                "aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)), sks[0], "
                "(acc, x) -> kll_sketch_merge_double(acc, x)) END AS mk"
            )
        )
    )
    row = merged.select(
        F.expr("kll_sketch_get_n_double(mk)").alias("n"),
        *[
            F.expr(f"kll_sketch_get_quantile_double(mk, {q}d)").alias(
                f"v_{int(q * 100)}"
            )
            for q in _KLL_QS
        ],
    ).collect()[0]
    total = batch_events.count()
    assert row["n"] == total, (row["n"], total)

    bands = batch_events.agg(
        *[
            e
            for q in _KLL_QS
            for e in (
                F.expr(f"percentile(value, {q - _KLL_RANK_TOL})").alias(
                    f"lo_{int(q * 100)}"
                ),
                F.expr(f"percentile(value, {q + _KLL_RANK_TOL})").alias(
                    f"hi_{int(q * 100)}"
                ),
            )
        ]
    ).collect()[0]
    for q in _KLL_QS:
        v = row[f"v_{int(q * 100)}"]
        lo, hi = bands[f"lo_{int(q * 100)}"], bands[f"hi_{int(q * 100)}"]
        assert lo <= v <= hi, (q, v, lo, hi)


def test_streaming_cms_cells_reconcile_exactly(spark, tmp_path):
    """CMS cells are additive counters, so the streamed per-day
    matrices must be CELL-FOR-CELL equal to the batch build across any
    micro-batch split, and their cellwise-summed rollup must reproduce
    the registry query's (est_cnt, exact_cnt) for every heavy key —
    the strongest (exact, not tolerance) reconciliation in the
    streaming sketch family."""
    from cam_location_addressing_feature_service_etl_spark.streaming.events import (
        tumbling_cms_cells,
    )
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        _cms_bucket,
    )

    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)
    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        tumbling_cms_cells(raw)
        .writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.table("cms_cells")

    depth_rows = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(_CMS_DEPTH)])
    )
    batch_cells = (
        batch_events.select(F.date_trunc("day", "ts").alias("bucket_start"), "user_id")
        .withColumn("row", depth_rows)
        .groupBy(
            "bucket_start",
            "row",
            _cms_bucket(F.col("user_id"), F.col("row"), _CMS_WIDTH).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = ["bucket_start", "row", "bucket"]
    diff = (
        streamed.alias("s")
        .join(batch_cells.alias("t"), keys, "full")
        .filter(
            F.col("s.c").isNull()
            | F.col("t.c").isNull()
            | (F.col("s.c") != F.col("t.c"))
        )
        .count()
    )
    assert diff == 0, "streamed CMS cells diverge from the batch build"

    # rollup: cellwise sum across buckets, then min-over-depth per key
    merged = streamed.groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    reg = QUERIES["a12_cms_heavy_hitters"](spark, SF_SMOKE)
    probes = reg.select("user_id", "exact_cnt", "est_cnt").withColumn(
        "row", depth_rows
    ).withColumn("bucket", _cms_bucket(F.col("user_id"), F.col("row"), _CMS_WIDTH))
    est = (
        probes.join(F.broadcast(merged), ["row", "bucket"])
        .groupBy("user_id", "exact_cnt", "est_cnt")
        .agg(F.min("c").cast("long").alias("est_from_stream"))
    )
    bad = est.filter(F.col("est_from_stream") != F.col("est_cnt")).count()
    assert bad == 0, "streamed rollup estimates diverge from the registry query"


def test_streaming_decayed_engagement_semigroup_reconciles(spark, tmp_path):
    """The decay law's semigroup property, proven end-to-end: per-user
    scores maintained across two micro-batches (one re-anchor multiply
    per batch, never a history rescan) must — after re-anchoring every
    user to the corpus max timestamp — match the batch query's
    decayed_micro within the per-event floor tolerance (the batch
    floors each term to integer micro-units; the stream keeps floats),
    with event counts matching exactly."""
    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        decayed_engagement_state,
    )
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _DECAY_HL_MS,
    )

    batch_events = load(spark, SF_SMOKE, "events")
    d = _split_replay_dir(spark, tmp_path, batch_events)
    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        decayed_engagement_state(raw)
        .writeStream.format("memory")
        .queryName("decay_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update-mode sink appends a row per (user, batch): keep the last
    # emission per user (largest n_events — counts only grow)
    rows = spark.table("decay_state").collect()
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    corpus_max = batch_events.agg(F.max(F.unix_millis("ts"))).collect()[0][0]

    expect = {
        r["user_id"]: (r["n_events"], r["decayed_micro"])
        for r in QUERIES["ev_decayed_engagement"](spark, SF_SMOKE).collect()
    }
    assert set(last) == set(expect)
    for uid, r in last.items():
        n_b, micro_b = expect[uid]
        assert r["n_events"] == n_b, (uid, r["n_events"], n_b)
        rescored = r["score"] * 2.0 ** (-(corpus_max - r["anchor_ms"]) / _DECAY_HL_MS)
        tol = 1.0e-6 * n_b + 1e-9 * abs(micro_b / 1e6)
        assert abs(rescored - micro_b / 1e6) <= tol, (
            uid, rescored, micro_b / 1e6, tol
        )
