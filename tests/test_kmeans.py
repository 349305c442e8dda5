"""Lloyd's k-means quality/determinism checks (no SQL oracle exists for
iterative algorithms; these tests are its correctness evidence):
every vector assigned exactly once, iterations reduce within-cluster
SSE monotonically (up to float noise), and clusters align with the
generator's ``label`` column far better than chance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_update,
    lloyd,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from tests.conftest import SF_SMOKE


def _sse(spark, vectors, assignments):
    cents = kmeans_update(vectors, assignments)
    member = vectors.join(assignments, "vec_id").join(F.broadcast(cents), "cluster")
    d = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return member.agg(F.sum(d)).collect()[0][0]


def test_every_vector_assigned_once_and_deterministic(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    a1 = lloyd(emb, k=8, iterations=2)
    assert a1.count() == emb.count()
    assert a1.select("vec_id").distinct().count() == emb.count()
    a2 = lloyd(emb, k=8, iterations=2)
    diff = a1.alias("x").join(
        a2.alias("y"), on="vec_id"
    ).filter(F.col("x.cluster") != F.col("y.cluster"))
    assert diff.count() == 0  # deterministic across runs


def test_iterations_do_not_worsen_sse(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sse1 = _sse(spark, v, lloyd(emb, k=8, iterations=1))
    sse3 = _sse(spark, v, lloyd(emb, k=8, iterations=3))
    assert sse3 <= sse1 * 1.0001


def test_clustering_beats_single_cluster_baseline(spark):
    """The testdata embeddings are unclustered (label-cluster
    contingency is uniform), so quality is asserted against the
    degenerate baseline: k=8 SSE must be well below all-in-one-cluster
    SSE."""
    emb = load(spark, SF_SMOKE, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    single = v.select("vec_id", F.lit(0).alias("cluster"))
    sse_single = _sse(spark, v, single)
    sse_k8 = _sse(spark, v, lloyd(emb, k=8, iterations=3))
    assert sse_k8 < sse_single * 0.95, (sse_k8, sse_single)


def test_array_argmin_matches_window_form(spark):
    """r16 optimization guard: the map-side ``array_min`` argmin /
    argmax (operators/kmeans.py ``kmeans_assign``,
    operators/similarity.py ``ivf_assign``) must reproduce the
    crossJoin + row_number-window form it replaced BIT-FOR-BIT —
    same rounded metric, same (metric, id ASC) tie-break — on the
    real smoke embeddings."""
    from pyspark.sql.window import Window

    from cam_location_addressing_feature_service_etl_spark.operators.kmeans import (
        _sq_dist,
    )
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        as_double_array,
        dot_col,
        ivf_assign,
        norm_col,
    )

    emb = load(spark, SF_SMOKE, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )

    # window form of the euclidean argmin (the pre-r16 kmeans_assign)
    d = F.round(_sq_dist(F.col("v"), F.col("c")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cluster"))
    win = (
        v.crossJoin(F.broadcast(cents))
        .select("vec_id", "cluster", d.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "cluster")
    )
    arr = kmeans_assign(v, cents, round_digits=6)
    assert sorted(win.collect()) == sorted(arr.collect())

    # window form of the cosine argmax (the pre-r16 ivf_assign)
    c2 = cents.select(
        F.col("cluster").cast("long").alias("centroid_id"),
        as_double_array(F.col("c")).alias("cv"),
    ).withColumn("cn", norm_col(F.col("cv")))
    v2 = v.select("vec_id", as_double_array(F.col("v")).alias("vv")).withColumn(
        "vn", norm_col(F.col("vv"))
    )
    ccos = F.round(
        dot_col(F.col("vv"), F.col("cv")) / (F.col("vn") * F.col("cn")), 6
    )
    w2 = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("centroid_id")
    )
    win2 = (
        v2.crossJoin(F.broadcast(c2))
        .select("vec_id", "centroid_id", ccos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w2))
        .filter("rn = 1")
        .select("vec_id", "centroid_id")
    )
    arr2 = ivf_assign(
        v.select("vec_id", F.col("v").alias("embedding")),
        cents.select(
            F.col("cluster").cast("long").alias("vec_id"),
            F.col("c").alias("embedding"),
        ),
    )
    assert sorted(win2.collect()) == sorted(arr2.collect())


def test_semdedup_prune_semantics(spark):
    """SemDeDup invariants on the smoke fixture: (1) every vector
    appears exactly once with a cluster and kept flag; (2) a vector is
    pruned iff SOME same-cluster vector with a smaller id has cosine
    >= tau (the keep-first variant — matching the common
    implementation, which prunes against prior points whether or not
    those were themselves kept); (3) the minimum id of every cluster
    is always kept; (4) the fixture actually prunes something."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _SEMDEDUP_TAU,
    )
    from tests.conftest import SF_SMOKE
    import duckdb

    rows = QUERIES["sim_semdedup_prune"](spark, SF_SMOKE).collect()
    got = {r["vec_id"]: (r["cluster"], r["kept"]) for r in rows}
    assert len(got) == len(rows)  # one row per vector

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    vecs = {
        v: e
        for v, e in con.execute(
            "SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x / "
            "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) "
            "FROM embeddings"
        ).fetchall()
    }
    assert set(vecs) == set(got)

    def cos(a, b):
        return round(sum(x * y for x, y in zip(vecs[a], vecs[b])), 6)

    by_cluster: dict[int, list[int]] = {}
    for v, (c, _) in got.items():
        by_cluster.setdefault(c, []).append(v)
    n_pruned = 0
    for c, members in by_cluster.items():
        members.sort()
        assert got[members[0]][1] is True  # min id always kept
        for v in members:
            expect_pruned = any(
                cos(u, v) >= _SEMDEDUP_TAU for u in members if u < v
            )
            assert got[v][1] == (not expect_pruned), (v, c)
            n_pruned += expect_pruned
    assert n_pruned > 0
