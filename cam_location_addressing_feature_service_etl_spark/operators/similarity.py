"""Embedding similarity search — ANN over an ``array<float>`` column.

Brute-force cosine top-k is the correctness baseline; IVF bucketing
(assign-to-nearest-centroid, search within bucket) is the scale path:
at 100 TB the cross join disappears and each probe touches one
bucket's partitions only. All math is built-in column expressions
(``zip_with`` + ``aggregate``) — JVM-side, codegen-friendly, no UDFs.

Determinism: dot products fold left in array order in both Spark and
the DuckDB oracle; cosines are rounded before ranking so tie-breaking
(neighbor id asc) is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Left-fold dot product in array order (matches DuckDB's
    list_dot_product evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def as_double_array(c: Column) -> Column:
    return c.cast("array<double>")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); ``vectors``
    streams through one pass — O(|Q|·|V|) work but a single scan and
    no shuffle except the per-query top-k (window on query id).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("nv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("nv")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF cells).

    Centroids are broadcast; the argmax is a row_number window keyed on
    the vector id — one shuffle on vector id, which at scale becomes
    the bucketed layout you then co-partition searches against.
    """
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    v = vectors.select(
        F.col(id_col).alias("vid"), as_double_array(F.col(vec_col)).alias("vv")
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "vid",
        "centroid_id",
        F.round(cosine_col(F.col("vv"), F.col("cv")), round_digits).alias("ccos"),
    )
    w = Window.partitionBy("vid").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("vid").alias("vec_id"), "centroid_id")
    )


def normalized_col(a: Column) -> Column:
    """Unit-normalize: each element divided by the fold-left L2 norm.
    Same op order as the DuckDB oracle's list_transform, so the bits
    entering the pair kernel are identical in both engines."""
    return F.transform(a, lambda x: x / norm_col(a))


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All pairs (a<b) with cosine ≥ threshold, computed as a blocked
    GEMM: vectors are unit-normalized JVM-side, the full normalized
    matrix is broadcast (like the build side of a broadcast join), and
    each partition multiplies its block against it with numpy
    (BLAS-vectorized mapInPandas) — ~50× the per-pair expression path.

    Scale: at 100 TB you tile the broadcast side (IVF-block or
    band-partition both sides); the kernel is unchanged. The float
    delta between BLAS accumulation and a sequential fold is ~1e-15
    relative — far inside the 1e-6 rounding applied on both sides.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    v = vectors.select(F.col(id_col), normalized_col(as_double_array(F.col(vec_col))).alias("nv"))
    rows = v.collect()  # broadcast build side: ids + normalized matrix
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    sc = vectors.sparkSession.sparkContext
    build = sc.broadcast((ids, mat))

    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def kernel(batches):
        ids_b, mat_b = build.value
        for pdf in batches:
            if pdf.empty:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.vstack(pdf["nv"].to_numpy())
            sims = np.round(block @ mat_b.T, round_digits)
            ia, ib = np.nonzero(
                (sims >= threshold) & (block_ids[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame(
                {"id_a": block_ids[ia], "id_b": ids_b[ib], "cosine": sims[ia, ib]}
            )

    return v.mapInPandas(kernel, out_schema)
