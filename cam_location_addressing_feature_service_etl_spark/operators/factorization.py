"""Distributed linear algebra over embedding columns: Gram-matrix PCA
via power iteration, and product-quantization code assignment.

Everything is computed in EXACT integer/decimal arithmetic (micro-unit
fixed point) so results are bit-identical across engines — the same
discipline the repo's verify notes mandate for float aggregates, taken
to its conclusion: no float aggregation at all. ``FLOOR(x*1e6 + 0.5)``
of an IEEE double is deterministic (multiply, add, floor are all
exactly-rounded single operations), integer sums/products are exact in
Spark DECIMAL(38,0) and DuckDB HUGEINT alike, and division appears
only as integer division of non-negative operands (sign carried
separately), where truncation and floor coincide.

Scale design:

- The Gram matrix is the classic d² reduction: one pass over the data
  producing d² partial products per partition (map-side combined), so
  the shuffle moves O(d² × partitions) rows no matter how many input
  vectors exist. Power iteration then runs on the d×d frame — constant
  size, independent of corpus scale.
- PQ assignment broadcasts the (m × k × d/m)-row codebook and makes
  one pass over the vectors; the argmin is a lexicographic struct MIN,
  not a window, so no second wide shuffle.

Reference parity: the reference engine has no linear-algebra surface;
these extend the similarity-search family (SURVEY §2 extensions) the
way ``operators/similarity.py`` does for ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for embedding components.
MICRO = 1_000_000


def micro_components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, pos, xi) rows with xi = FLOOR(v[pos]*1e6 + 0.5) as BIGINT —
    the exact fixed-point view of an array<float> column. ``pos`` is
    1-based to match SQL ``generate_subscripts``."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "x"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x") * MICRO + F.lit(0.5)).cast("long").alias("xi"),
    )


def gram_matrix(x: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Exact Gram matrix G[i,j] = Σ_v x_v[i]·x_v[j] over micro-unit
    components, as (i, j, g) with g DECIMAL(38,0).

    The self-join on the vector id expands each vector to d² product
    terms, but the following aggregate is map-side combinable, so the
    shuffle carries at most d² rows per task — the standard "tall
    matrix → tiny Gram" reduction that makes PCA a one-pass distributed
    job. Products are summed as DECIMAL(38,0): |xi| ≲ 1e7 micro-units
    keeps Σ within 38 digits up to ~1e23 vectors."""
    a = x.select(F.col(id_col).alias("_v"), F.col("pos").alias("i"), F.col("xi").alias("xa"))
    b = x.select(F.col(id_col).alias("_v"), F.col("pos").alias("j"), F.col("xi").alias("xb"))
    return (
        a.join(b, "_v")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("g")
        )
    )


def power_iteration(gram: DataFrame, rounds: int) -> DataFrame:
    """Fixed-round power iteration v ← G·v over the exact Gram frame,
    renormalized to micro-units each round by INTEGER division:
    v'[i] = sign(u[i]) · (|u[i]|·1e6 div max|u|), u = G·v.

    Every operation is exact (decimal products/sums, non-negative
    integer division), so after a fixed number of rounds the integer
    vector is a pure function of the input — oracle-checkable like the
    repo's other fixed-round iteratives (PageRank, CC, BPE). The frame
    is d rows; each round is a broadcast-scale join, cost independent
    of corpus size. Returns (pos, vi) with vi BIGINT micro-units."""
    # The (expensive, corpus-scale) Gram subtree feeds EVERY round's
    # plan plus the node derivation: materialize it once, coalesced to
    # a single task — it is d² rows, metadata-sized.
    gram = gram.coalesce(1).localCheckpoint(eager=False)
    d_rows = gram.select(F.col("i").alias("pos")).distinct()
    v = d_rows.select("pos", F.lit(MICRO).cast("long").alias("vi"))
    for r in range(rounds):
        u = (
            gram.join(v.withColumnRenamed("pos", "j"), "j")
            .groupBy(F.col("i").alias("pos"))
            .agg(
                F.sum(F.col("g") * F.col("vi").cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias("u")
            )
        )
        mx = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = (
            u.crossJoin(F.broadcast(mx))
            .select(
                "pos",
                (
                    F.signum(F.col("u")).cast("long")
                    * F.expr(f"CAST((abs(u) * {MICRO}) DIV m AS BIGINT)")
                ).alias("vi"),
            )
        )
        if r < rounds - 1:
            v = v.localCheckpoint(eager=False)
    return v


def pca_project(x: DataFrame, v: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Projection of each micro-unit vector onto the (micro-unit)
    dominant direction: proj = Σ_i x[i]·v[i], exact BIGINT. One
    broadcast join + aggregate — map-side combinable, no wide shuffle."""
    return (
        x.join(F.broadcast(v), "pos")
        .groupBy(id_col)
        .agg(F.sum(F.col("xi") * F.col("vi")).cast("long").alias("proj"))
    )


def pq_codes(
    x: DataFrame,
    codebook_ids: int,
    sub_dims: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization code assignment with an exact integer
    metric: dims are split into ``d/sub_dims`` subspaces; the vectors
    with id < ``codebook_ids`` serve as the (deterministic) codebook;
    each (vector, subspace) is assigned the codebook entry minimizing
    the exact squared L2 distance in micro-units, ties broken by
    smaller code.

    The argmin is ``MIN(struct(dist, code))`` — lexicographic struct
    min — so the plan is two partial-aggregatable groupBys and zero
    window functions. The codebook side is broadcast (m·k·sub_dims
    rows). Returns (id, subspace, code, dist_sq)."""
    xs = x.select(
        id_col,
        ((F.col("pos") - 1) / sub_dims).cast("long").alias("subspace"),
        "pos",
        "xi",
    )
    cb = (
        xs.filter(F.col(id_col) < codebook_ids)
        .select(F.col(id_col).alias("code"), "subspace", "pos", F.col("xi").alias("ci"))
    )
    diff = xs.join(F.broadcast(cb), ["subspace", "pos"])
    per_code = (
        diff.groupBy(id_col, "subspace", "code")
        .agg(F.sum((F.col("xi") - F.col("ci")) * (F.col("xi") - F.col("ci"))).alias("dist_sq"))
    )
    best = (
        per_code.groupBy(id_col, "subspace")
        .agg(F.min(F.struct("dist_sq", "code")).alias("best"))
        .select(
            id_col,
            "subspace",
            F.col("best.code").alias("code"),
            F.col("best.dist_sq").alias("dist_sq"),
        )
    )
    return best
