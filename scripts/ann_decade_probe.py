#!/usr/bin/env python
"""ANN second-decade probe (r13 verdict #4): the sf0.1 → sf1 decade
showed brute-force top-k and bucketed IVF both fixed-overhead-bound
(×1.23 / ×1.32); this probe runs the NEXT decade — 20k → 200k vectors
— where the scan-everything and scan-one-cell shapes separate, and
records IVF's recall@3 against the exact brute answer over the SAME
candidate space (members only, self excluded) at that size.

The 200k table is `gen_scale_data.gen_embeddings(rng(42), 200_000)`
written standalone (embeddings-only dir; the ANN queries load nothing
else). Standalone means the rng stream differs from a hypothetical
full-sf10 generation — irrelevant here, the distribution is identical
(10 unit-norm clusters, noise 0.35, renormalized).

Usage: python scripts/ann_decade_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from cam_location_addressing_feature_service_etl_spark.runtime import (
    release_plan_refs,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

_DIR_200K = "/tmp/spark-graft-ann200k"
_DIRS = [
    ("gen-sf1 (20k vecs)", "/tmp/spark-graft-sf1"),
    ("200k vecs", _DIR_200K),
]


def _ensure_200k() -> None:
    path = os.path.join(_DIR_200K, "embeddings.parquet")
    if os.path.exists(path):
        return
    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_scale_data import gen_embeddings

    os.makedirs(_DIR_200K, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_embeddings(rng, 200_000), path)
    print(f"generated {path}")


def main() -> int:
    _ensure_200k()
    spark = get_spark(app_name="ann-decade-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for qname in ("sim_cosine_topk_bruteforce", "sim_ann_ivf_bucketed"):
        res = {}
        for dname, d in _DIRS:
            best, rows = None, 0
            for _ in range(2):
                release_plan_refs()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                rows = QUERIES[qname](spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            res[dname] = best
            print(f"{qname:28s} {dname:18s} rows={rows:>4}  {best:7.2f}s")
        a, b = (res[d] for d, _ in _DIRS)
        print(f"{qname:28s} DECADE 200k/20k = x{b / a:.2f}")

    # recall@3 of IVF (nprobe=1) vs exact brute over the SAME space:
    # members only (vec_id >= n_centroids), self excluded, same query
    # ids, same (cosine DESC, neighbor_id ASC) tie order
    from pyspark.sql import functions as F

    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        brute_force_topk,
    )
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _IVF_CENTROIDS,
        _IVF_QUERY_HI,
        _IVF_QUERY_LO,
    )

    for dname, d in _DIRS:
        emb = load(spark, d, "embeddings")
        members = emb.filter(F.col("vec_id") >= _IVF_CENTROIDS)
        queries = members.filter(
            (F.col("vec_id") >= _IVF_QUERY_LO) & (F.col("vec_id") < _IVF_QUERY_HI)
        )
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(members, queries, k=3)
            .filter(F.col("rank") <= 3)
            .collect()
        }
        ivf = {
            (r["query_id"], r["neighbor_id"])
            for r in QUERIES["sim_ann_ivf_bucketed"](spark, d).collect()
        }
        nq = _IVF_QUERY_HI - _IVF_QUERY_LO
        print(
            f"recall@3 {dname:18s} = {len(exact & ivf)}/{len(exact)} "
            f"({len(exact & ivf) / len(exact):.3f}) over {nq} queries"
        )

    # --- query FLEET at 200k: where brute and IVF actually separate.
    # 10 queries × 200k vectors is 2M sims — fixed-overhead territory
    # for either plan; a 2,000-query fleet (the production serving
    # shape) is 400M sims for brute vs ~1/8 of that for nprobe=1 IVF.
    from pyspark.sql.window import Window

    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        as_double_array,
        dot_col,
        ivf_assign,
        norm_col,
    )

    fleet_q = 2_000
    emb = load(spark, _DIR_200K, "embeddings")
    centroids = emb.filter(F.col("vec_id") < _IVF_CENTROIDS)
    members = emb.filter(F.col("vec_id") >= _IVF_CENTROIDS).localCheckpoint()
    queries = members.filter(F.col("vec_id") < _IVF_CENTROIDS + fleet_q)

    t0 = time.perf_counter()
    exact_fleet = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(members, queries, k=3)
        .filter(F.col("rank") <= 3)
        .collect()
    }
    dt_brute = time.perf_counter() - t0

    t0 = time.perf_counter()
    assigned = ivf_assign(members, centroids).join(
        members.select(
            "vec_id", as_double_array(F.col("embedding")).alias("e")
        ).withColumn("n", norm_col(F.col("e"))),
        "vec_id",
    ).localCheckpoint()
    qf = assigned.filter(F.col("vec_id") < _IVF_CENTROIDS + fleet_q).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid_id").alias("qc"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    scored = assigned.join(
        F.broadcast(qf),
        (F.col("centroid_id") == F.col("qc"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot_col(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("n")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ivf_fleet = {
        (r["query_id"], r["neighbor_id"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    dt_ivf = time.perf_counter() - t0
    hit = len(exact_fleet & ivf_fleet)
    print(
        f"fleet@200k ({fleet_q} queries): brute {dt_brute:.1f}s vs IVF "
        f"(nprobe=1, incl. assign) {dt_ivf:.1f}s = x{dt_brute / dt_ivf:.2f}; "
        f"recall@3 {hit}/{len(exact_fleet)} ({hit / len(exact_fleet):.3f})"
    )

    # --- TRAINED centroids (r14 verdict #4: the registered quality
    # tier, sim_ann_ivf_trained): k-means coarse quantizer + nprobe
    # dial, recall@3 vs the same exact fleet answer. The generator's
    # embedding space has 10 latent clusters, so trained k=8 centroids
    # land on real density modes where the first-8-vectors quantizer
    # of the demo rows above lands on arbitrary points.
    from cam_location_addressing_feature_service_etl_spark.operators.kmeans import (
        lloyd_train,
    )
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        ivf_search,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _IVT_ROUNDS,
    )

    t0 = time.perf_counter()
    cent = lloyd_train(
        members, k=_IVF_CENTROIDS, iterations=_IVT_ROUNDS, round_digits=6
    ).select(
        F.col("cluster").cast("bigint").alias("vec_id"),
        F.col("c").alias("embedding"),
    ).localCheckpoint()
    dt_train = time.perf_counter() - t0
    print(f"lloyd_train k={_IVF_CENTROIDS} rounds={_IVT_ROUNDS}: {dt_train:.1f}s")
    for nprobe in (1, 2, 4):
        t0 = time.perf_counter()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_search(
                members, cent, queries, k=3, nprobe=nprobe
            ).collect()
        }
        dt = time.perf_counter() - t0
        hit = len(exact_fleet & got)
        print(
            f"trained IVF nprobe={nprobe} fleet@200k: {dt:6.1f}s  "
            f"recall@3 {hit}/{len(exact_fleet)} "
            f"({hit / len(exact_fleet):.3f})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
