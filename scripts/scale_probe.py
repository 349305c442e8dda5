#!/usr/bin/env python
"""Empirical scaling probe: run the bucketed dedup/search operators on
1x/2x/4x self-unioned copies of the sf0.1 documents corpus (doc_id
offset per copy keeps ids distinct, a suffix tag perturbs each copy's
text so replicas are near- but not exact duplicates) and print the
wall-time growth factor per doubling.

A bucketed operator (LSH bands, gram hash groups, postings) should grow
close to linearly (factor ~2 per doubling, plus collision growth where
the corpus genuinely contains more near-dups); an accidental all-pairs
stage would show factor ~4. The committed results live in SCALING.md.

The graph family is probed too (round-8 addendum): co-purchase
exact-vs-DIMSUM on a CUSTOMER-replicated basket frame (item degrees
double per doubling — the hub-growth regime DIMSUM exists for), and
triangles / cc_star on disjoint self-unioned edge copies (the bound is
linear; an accidental cross-copy all-pairs stage would show ~x4).

Usage: python scripts/scale_probe.py [sf_dir] [dedup|graph|ann|spatial|temporal|fuzzy|pip|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.session import get_spark, tune
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload.geo import edge_band_rows


def scaled_docs(base: DataFrame, copies: int) -> DataFrame:
    n = base.selectExpr("max(doc_id)").collect()[0][0] + 1
    parts = []
    for c in range(copies):
        part = base.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            # perturb each copy so replicas are near-dups, not byte dups
            F.concat(F.col("text"), F.lit(f" copytag{c}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # persist (NOT localCheckpoint): Dataset.unpersist only releases
    # CacheManager entries, so a checkpointed corpus would stay pinned
    # in executor storage for the whole run and later scales would be
    # timed under accumulated memory pressure
    out = out.repartition(32).persist()
    out.count()
    return out


def _timed(ops: dict, d, prev_dt: dict, copies: int) -> None:
    for name, fn in ops.items():
        fn(d)  # warm (plan + JIT)
        t0 = time.perf_counter()
        rows = fn(d)
        dt = time.perf_counter() - t0
        p = prev_dt[name]
        factor = "" if p is None else f"  x{dt / p:.2f} per doubling"
        print(f"{name:16s} {copies}x  rows={rows:>9}  {dt:6.2f}s{factor}")
        prev_dt[name] = dt


def graph_probe(spark, sf_dir: str) -> None:
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        connected_components_star,
    )
    from cam_location_addressing_feature_service_etl_spark.operators.triangles import (
        triangle_counts_per_node,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.graph import (
        _COSIM_MIN_COOC,
        _TRI_MIN_SHARED,
        copurchase_pairs_dimsum,
        copurchase_pairs_exact,
    )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    # persist the base ONCE: the per-scale replication unions and the
    # max-id collect would otherwise recompute the join+distinct
    # subtree ~10 times across the three scales (review-pass catch)
    cp_base = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    cp_max = cp_base.agg(F.max("c")).collect()[0][0] + 1

    def scaled_customers(copies: int):
        """Replicate CUSTOMERS (c offset, item ids unchanged): item
        degree doubles per doubling — the regime where exact pairing
        cost doubles but DIMSUM's per-basket keep rate falls by sqrt2,
        so its pair fan-out stays ~flat (the sampler's whole premise)."""
        out = cp_base
        for i in range(1, copies):
            out = out.unionByName(
                cp_base.select((F.col("c") + i * cp_max).alias("c"), "p")
            )
        out = out.repartition(32).persist()
        out.count()
        return out

    def op_copurchase_exact(cp):
        return copurchase_pairs_exact(cp, _COSIM_MIN_COOC).count()

    def op_copurchase_dimsum(cp):
        return copurchase_pairs_dimsum(cp).count()

    print("== co-purchase: customer-replicated (degree grows) ==")
    prev = {"cosim_exact": None, "cosim_dimsum": None}
    for copies in (1, 2, 4):
        cp = scaled_customers(copies)
        _timed(
            {"cosim_exact": op_copurchase_exact, "cosim_dimsum": op_copurchase_dimsum},
            cp,
            prev,
            copies,
        )
        cp.unpersist(blocking=True)
        print()

    cp_base.unpersist(blocking=True)
    ps = lineitem.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges_base = (
        ps.alias("a")
        .join(ps.alias("b"), (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("id_a"), F.col("b.s").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _TRI_MIN_SHARED)
        .select("id_a", "id_b")
        .persist()
    )
    edge_max = edges_base.agg(
        F.greatest(F.max("id_a"), F.max("id_b"))
    ).collect()[0][0] + 1

    def scaled_edges(copies: int):
        """Disjoint copies (both endpoints offset): linear bound; a
        cross-copy all-pairs stage would show ~x4 per doubling."""
        out = edges_base
        for i in range(1, copies):
            out = out.unionByName(
                edges_base.select(
                    (F.col("id_a") + i * edge_max).alias("id_a"),
                    (F.col("id_b") + i * edge_max).alias("id_b"),
                )
            )
        out = out.repartition(32).persist()
        out.count()
        return out

    print("== supplier graph: disjoint self-unioned copies ==")
    prev = {"triangles": None, "cc_star": None}
    for copies in (1, 2, 4):
        e = scaled_edges(copies)
        _timed(
            {
                "triangles": lambda d: triangle_counts_per_node(d).count(),
                "cc_star": lambda d: connected_components_star(d).count(),
            },
            e,
            prev,
            copies,
        )
        e.unpersist(blocking=True)
        print()

    # Label propagation on the REGISTRY query's own symmetrized
    # customer<->supplier edge set, customer-replicated (r9: the 3
    # fixed rounds are joins + partial-agg groupBys; the bound is
    # linear in edges — an accidental per-round all-pairs or window
    # stage would show ~x4 per doubling).
    from cam_location_addressing_feature_service_etl_spark.operators.labelprop import (
        label_propagation,
    )

    lpa_base = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
        .persist()
    )
    lpa_base.count()

    def scaled_lpa_edges(copies: int):
        """Customer ids offset per copy, supplier ids SHARED: supplier
        degree doubles per doubling (the hub-growth regime the AQE
        skew-split exists for), community structure stays connected."""
        out = lpa_base
        for i in range(1, copies):
            out = out.unionByName(
                lpa_base.select(
                    F.concat(F.lit(f"r{i}"), F.col("c")).alias("c"), "s"
                )
            )
        pairs = out.repartition(32).persist()
        pairs.count()
        return pairs

    print("== label propagation: customer-replicated (degree grows) ==")
    prev = {"labelprop_3r": None}
    for copies in (1, 2, 4):
        pr = scaled_lpa_edges(copies)
        edges = pr.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
            pr.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        _timed(
            {"labelprop_3r": lambda d: label_propagation(d, rounds=3).count()},
            edges,
            prev,
            copies,
        )
        pr.unpersist(blocking=True)
        print()

    # Walk-adjacency hub-degree probe (r17, r16 verdict #3): the C2
    # walk rewrites hold ONE sorted adjacency array per node
    # (workload/graph.py node2vec_walk_frame / the first-order hop) —
    # an O(deg) row. This leg measures, under the same hub-growth
    # regime as the labelprop leg (supplier degree doubles per
    # doubling), the max per-node degree, the max per-row adjacency
    # payload in bytes, and the 3-hop node2vec wall time — the numbers
    # SCALING.md's written bound quotes.
    from cam_location_addressing_feature_service_etl_spark.workload.graph import (
        _N2V_SEED,
        node2vec_walk_frame,
    )

    print("== walk adjacency arrays: customer-replicated (hub degree grows) ==")
    prev = {"node2vec_3hop": None}
    for copies in (1, 2, 4):
        pr = scaled_lpa_edges(copies)
        edges = pr.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
            pr.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        stats = (
            edges.groupBy("src")
            .agg(
                F.count(F.lit(1)).alias("d"),
                F.sum(F.length("dst")).alias("bytes"),
            )
            .agg(
                F.max("d").alias("max_deg"),
                F.max("bytes").alias("max_row_bytes"),
                F.avg("d").alias("avg_deg"),
            )
            .collect()[0]
        )
        print(
            f"[{copies}x] max_deg={stats['max_deg']} "
            f"max_row_bytes={stats['max_row_bytes']} "
            f"avg_deg={stats['avg_deg']:.1f}"
        )
        starts = (
            edges.filter(F.col("src").startswith("s:"))
            .select(F.col("src").alias("start"))
            .distinct()
        )
        _timed(
            {
                "node2vec_3hop": lambda d: node2vec_walk_frame(
                    d, starts, 3, _N2V_SEED
                ).count()
            },
            edges,
            prev,
            copies,
        )
        pr.unpersist(blocking=True)
        print()
    lpa_base.unpersist(blocking=True)


def ann_probe(spark) -> None:
    """Search-stage contrast at meaningful corpus sizes: brute-force
    exact top-3 (full 64-dim vectors scanned per query) vs ADC top-3
    over a PREBUILT IVF-PQ index (only the probed cells' byte-sized
    codes scanned). The corpus is synthetic-deterministic (xxhash64
    micro-unit components), so runs are reproducible; the build stage
    is deliberately excluded — production amortizes it across query
    batches (operators/factorization.adc_search_on_index)."""
    from pyspark.sql.window import Window

    from cam_location_addressing_feature_service_etl_spark.operators.factorization import (
        _ivfpq_parts,
        _sq_l2,
        adc_search_on_index,
    )

    dims, n_cells, codebook_ids, sub_dims = 64, 64, 64, 8
    n_queries, k, nprobe = 50, 3, 8

    def corpus(n: int):
        comps = F.array(
            *[
                (F.xxhash64(F.col("id"), F.lit(j)) % 2000001 - F.lit(1000000)).cast(
                    "long"
                )
                for j in range(dims)
            ]
        )
        return spark.range(n).select(F.col("id").alias("vec_id"), comps.alias("xs"))

    prev = {"ann_brute": None, "ann_adc": None}
    for n in (100_000, 200_000, 400_000):
        xs = corpus(n).repartition(32).persist()
        xs.count()
        queries = xs.filter(
            (F.col("vec_id") >= n_cells) & (F.col("vec_id") < n_cells + n_queries)
        )
        cents, cb, codes = _ivfpq_parts(xs, n_cells, codebook_ids, sub_dims)
        cents = cents.persist(); cb = cb.persist(); codes = codes.persist()
        codes.count()  # build materialized OUTSIDE the timed window

        def op_brute(_):
            qv = queries.select(
                F.col("vec_id").alias("query_id"), F.col("xs").alias("qxs")
            )
            scored = (
                xs.crossJoin(F.broadcast(qv))
                .filter(F.col("vec_id") != F.col("query_id"))
                .select(
                    "query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    _sq_l2(F.col("xs"), F.col("qxs")).alias("d"),
                )
            )
            w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
            return (
                scored.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k)
                .count()
            )

        def op_adc(_):
            return adc_search_on_index(
                cents, cb, codes, queries, sub_dims, k=k, nprobe=nprobe
            ).count()

        copies = n // 100_000
        _timed({"ann_brute": op_brute, "ann_adc": op_adc}, None, prev, copies)
        for f in (codes, cb, cents, xs):
            f.unpersist(blocking=True)
        print()


def spatial_probe(spark) -> None:
    """Grid-blocked kNN vs brute-force cross join, both sides doubling
    with the LONGITUDE SPAN doubling too (constant point density —
    more territory, same local crowding, the regime a growing address
    base actually lives in). Brute pairs = |A|·|B| → ~x4 per doubling;
    grid candidate pairs = Σ 9·aᵢ·bᵢ over cells → ~x2 (cells double,
    per-cell load constant). Synthetic-deterministic points (pmod of
    xxhash64), radius 50 km, 1° cells."""
    from pyspark.sql.window import Window

    from cam_location_addressing_feature_service_etl_spark.operators.spatial_join import (
        haversine_km,
        knn_within_radius,
    )

    n0, k, radius = 10_000, 3, 50.0

    def pts(n: int, span_deg: float, salt: int, id_col: str):
        h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(1_000_000))
        h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(salt + 1)), F.lit(1_000_000))
        return spark.range(n).select(
            F.col("id").alias(id_col),
            (-29.0 + h1 / 1_000_000.0 * 5.0).alias("lat"),
            (138.0 + h2 / 1_000_000.0 * span_deg).alias("lon"),
        )

    prev = {"knn_grid": None, "knn_brute": None}
    for copies in (1, 2, 4):
        n, span = n0 * copies, 16.0 * copies
        a = pts(n, span, 11, "point_id").repartition(32).persist()
        b = pts(n, span, 97, "cand_id").repartition(32).persist()
        a.count(); b.count()

        def op_grid(_):
            return knn_within_radius(
                a, b, k=k, radius_km=radius, cell_deg=1.0, max_abs_lat_deg=29.0
            ).count()

        def op_brute(_):
            pairs = a.join(b).select(
                "point_id",
                "cand_id",
                F.round(
                    haversine_km(a["lat"], a["lon"], b["lat"], b["lon"]), 1
                ).alias("dist_km"),
            ).filter(F.col("dist_km") <= radius)
            w = Window.partitionBy("point_id").orderBy("dist_km", "cand_id")
            return (
                pairs.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k)
                .count()
            )

        _timed({"knn_grid": op_grid, "knn_brute": op_brute}, None, prev, copies)
        a.unpersist(blocking=True); b.unpersist(blocking=True)
        print()


def temporal_probe(spark) -> None:
    """Bucketized interval-overlap join (the ev_interval_overlap_join
    plan shape) vs the naive range join, both sides doubling with the
    TIMELINE doubling too (constant temporal density — more weeks,
    same per-hour load, the regime a growing event log lives in).
    Both sides are KEYED (per-entity maintenance windows — the
    production shape; a global incident dimension is tiny and a
    broadcast BNLJ genuinely suffices there, measured flat before this
    rewrite). The naive plan equi-joins on the entity key and filters
    the range AFTER the join, so it materializes Σ_g |S_g|·|I_g|
    within-group pairs → ~x4 per doubling; the bucketed plan explodes
    sessions into covered hours and equi-joins on (entity, hour) →
    candidate rows = session-hours, ~x2. Times modeled as epoch
    seconds; hour bucket = floor(s/3600) — same algebra as the query's
    date_trunc form."""
    n0, hours0, groups = 200_000, 720, 500  # 30 days of hours at 1x

    def sessions(n: int, hours: int):
        h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(31)), F.lit(1_000_000))
        dur = F.pmod(F.xxhash64(F.col("id"), F.lit(32)), F.lit(10_800))  # 0-3 h
        smin = (h1 / 1_000_000.0 * hours * 3600).cast("long")
        return spark.range(n).select(
            F.col("id").alias("session_pk"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(33)), F.lit(groups)).alias("g"),
            smin.alias("smin"),
            (smin + dur).alias("smax"),
        )

    def incidents(hours: int):
        # per (entity, hour): ~25% qualify; err_n deterministic 5..24
        return (
            spark.range(hours * groups)
            .select(
                (F.col("id") % groups).alias("g"),
                F.expr(f"id div {groups}").alias("h"),
            )
            .filter(F.pmod(F.xxhash64("g", "h", F.lit(7)), F.lit(4)) == 0)
            .withColumn(
                "err_n",
                F.pmod(F.xxhash64("g", "h", F.lit(8)), F.lit(20)) + 5,
            )
        )

    prev = {"overlap_bucketed": None, "overlap_naive": None}
    for copies in (1, 2, 4, 8):  # 8x: the within-group pair count hits ~2.3G
        n, hours = n0 * copies, hours0 * copies
        s = sessions(n, hours).repartition(32).persist()
        i = incidents(hours).persist()
        s.count(); i.count()

        def op_bucketed(_):
            hrs = s.select(
                "session_pk",
                "g",
                F.explode(
                    F.sequence(
                        F.expr("smin div 3600"), F.expr("smax div 3600")
                    )
                ).alias("h"),
            )
            return hrs.join(i, ["g", "h"]).count()

        def op_naive(_):
            return s.join(
                i,
                (s["g"] == i["g"])
                & (F.col("h") * 3600 <= F.col("smax"))
                & ((F.col("h") + 1) * 3600 > F.col("smin")),
            ).count()

        _timed({"overlap_bucketed": op_bucketed, "overlap_naive": op_naive}, None, prev, copies)
        s.unpersist(blocking=True); i.unpersist(blocking=True)
        print()


def fuzzy_probe(spark) -> None:
    """PassJoin segment blocking vs the naive 8-block all-pairs join
    (the r8 geo_fuzzy_match_blocked plan), on a synthetic part corpus
    whose NAME CARDINALITY grows with row count (constant near-dup
    density — the regime a growing address base lives in; a fixed
    64-name vocabulary would make the OUTPUT itself quadratic and both
    plans x4). Names: ``<color(g)> <md5(g)><v>`` — the 33-char hash
    token keeps distinct groups far apart in edit space (a first cut
    used dense integer group ids, and digit-substitution
    neighborhoods made TRUE matches per name O(9^tau*C(d,tau)), not
    O(1) — the corpus, not the plan, went quadratic), so matches are
    the 6 within-group variant pairs only, and the ~8-char segments
    carry enough entropy that random-collision candidates stay
    negligible (a 10-char token probed 3-char segments, 4096 values
    — birthday collisions ~n^2/4096 crept back to x3/doubling;
    address-length strings are the honest domain regime anyway). Naive candidates =
    Sigma block^2 over 8 fixed blocks → x4 per doubling; PassJoin
    candidates share an exact (seg_idx, len, substring) key →
    ∝ matches → ~x2. Naive skipped at 4x (quadratic, minutes)."""
    from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
        passjoin_candidates,
    )

    colors = "red blue hot cold old new small large".split()
    carr = F.array(*[F.lit(c) for c in colors])
    varr = F.array(*[F.lit(x) for x in "abcd"])
    n0 = 10_000

    def parts(n: int):
        g = (F.col("id") / 4).cast("long")
        color = F.element_at(carr, (g % 8 + 1).cast("int"))
        name = F.concat(
            color,
            F.lit(" "),
            F.md5(g.cast("string")),
            F.element_at(varr, (F.col("id") % 4 + 1).cast("int")),
        )
        return spark.range(n).select(
            F.col("id").alias("p_partkey"), name.alias("p_name"), color.alias("blk")
        )

    prev = {"fuzzy_passjoin": None, "fuzzy_naive": None}
    for copies in (1, 2, 4):
        p = parts(n0 * copies).repartition(32).persist()
        p.count()

        def op_passjoin(_):
            names = p.select("blk", "p_name").distinct().withColumn(
                "nm_rest", F.expr("substring(p_name, length(blk) + 2)")
            )
            cand = passjoin_candidates(names, "p_name", "blk", 3, seg_col="nm_rest")
            matched = (
                cand.withColumn("d", F.levenshtein("name_a", "name_b"))
                .filter(F.col("d").between(1, 3))
                .select("name_a", "name_b", "d")
            )
            both = matched.unionByName(
                matched.select(
                    F.col("name_b").alias("name_a"),
                    F.col("name_a").alias("name_b"),
                    "d",
                )
            )
            a = p.select(F.col("p_partkey").alias("lk"), F.col("p_name").alias("ln"))
            b = p.select(F.col("p_partkey").alias("rk"), F.col("p_name").alias("rn"))
            return (
                a.join(both, a["ln"] == both["name_a"])
                .join(b, (both["name_b"] == b["rn"]) & (F.col("lk") < F.col("rk")))
                .count()
            )

        def op_naive(_):
            a = p.select("blk", F.col("p_partkey").alias("lk"), F.col("p_name").alias("ln"))
            b = p.select("blk", F.col("p_partkey").alias("rk"), F.col("p_name").alias("rn"))
            return (
                a.join(b, "blk")
                .filter(F.col("lk") < F.col("rk"))
                .filter(F.levenshtein("ln", "rn").between(1, 3))
                .count()
            )

        ops = {"fuzzy_passjoin": op_passjoin}
        if copies <= 2:
            ops["fuzzy_naive"] = op_naive
        _timed(ops, None, prev, copies)
        p.unpersist(blocking=True)
        print()


def fuzzy_link_probe(spark) -> None:
    """A×B linkage (passjoin_link, the geo_fuzzy_link_feed plan) vs
    the naive block join, with MASTER AND FEED both doubling on the
    same grown-vocabulary corpus as fuzzy_probe. The feed is a
    deterministic one-char corruption of each master name ('z' is
    outside both the color and hex alphabets, so every feed name is at
    exactly distance 1 from its master and nothing else collapses).
    Corruption lands in the REST (post-block), so blocks stay intact
    and the probe measures join scaling, not blocking recall. Naive
    candidates = Sigma |A_blk|x|B_blk| over 8 fixed blocks → x4 per
    doubling; passjoin_link candidates share the exact
    (seg_idx, len, substring) key → ∝ true links → ~x2. Naive skipped
    at 4x."""
    from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
        passjoin_link,
    )

    colors = "red blue hot cold old new small large".split()
    carr = F.array(*[F.lit(c) for c in colors])
    varr = F.array(*[F.lit(x) for x in "abcd"])
    n0 = 10_000

    def masters(n: int):
        g = (F.col("id") / 4).cast("long")
        color = F.element_at(carr, (g % 8 + 1).cast("int"))
        name = F.concat(
            color,
            F.lit(" "),
            F.md5(g.cast("string")),
            F.element_at(varr, (F.col("id") % 4 + 1).cast("int")),
        )
        return spark.range(n).select(name.alias("nm"), color.alias("blk"))

    prev = {"link_passjoin": None, "link_naive": None}
    for copies in (1, 2, 4):
        m = masters(n0 * copies).distinct().repartition(32).persist()
        # corrupt one rest character per name, position spread by hash
        pos = (
            F.pmod(F.xxhash64("nm"), F.length("nm") - F.length("blk") - 1)
            + F.length("blk")
            + 2
        ).cast("int")
        f = (
            m.withColumn("pos", pos)
            .select(
                "blk",
                F.concat(
                    F.expr("substring(nm, 1, pos - 1)"),
                    F.lit("z"),
                    F.expr("substring(nm, pos + 1)"),
                ).alias("nm"),
            )
            .distinct()
            .repartition(32)
            .persist()
        )
        m.count(), f.count()
        m_seg = m.withColumn("rest", F.expr("substring(nm, length(blk) + 2)"))
        f_seg = f.withColumn("rest", F.expr("substring(nm, length(blk) + 2)"))

        def op_link(_):
            cand = passjoin_link(m_seg, f_seg, "nm", "blk", 3, seg_col="rest")
            return cand.filter(
                F.levenshtein("name_a", "name_b") <= 3
            ).count()

        def op_naive(_):
            a = m.select("blk", F.col("nm").alias("mn"))
            b = f.select("blk", F.col("nm").alias("fn"))
            return (
                a.join(b, "blk")
                .filter(F.levenshtein("mn", "fn") <= 3)
                .count()
            )

        ops = {"link_passjoin": op_link}
        if copies <= 2:
            ops["link_naive"] = op_naive
        _timed(ops, None, prev, copies)
        m.unpersist(blocking=True)
        f.unpersist(blocking=True)
        print()


def semdedup_probe(spark) -> None:
    """SemDeDup within-cluster prune (semdedup_keep_first) at 1x/2x/4x
    under the two codebook regimes the operator's docstring claims:

    - ``constant_cell``: k grows with n (the paper's premise) — cell
      size stays ~2000, per-cell GEMM cost constant, total work ∝ n
      → ~x2 per doubling;
    - ``fixed_k``: k frozen at the 1x codebook — cell size ∝ n,
      per-cell GEMM ∝ cell², total work ∝ n²/k → ~x4 per doubling
      (the 'codebook due for retraining' failure mode, measured so
      the claim has a number).

    Vectors are deterministic sin-derived 64-dim, unit-normalized
    JVM-side; clusters assigned by hash — the probe isolates the PRUNE
    stage (the quadratic part), not Lloyd."""
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        normalized_col,
        semdedup_keep_first,
    )

    n0, cell = 32_000, 2_000
    dim = 64

    def assigned(n: int, k: int):
        # hash-decorrelated elements (a plain sin(id*dim + d) makes
        # every vector a shifted window of ONE sine wave — near-dup
        # soup; cost is GEMM-bound either way but kept counts would be
        # degenerate)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.sin(
                F.pmod(F.xxhash64(F.col("id") * dim + d), F.lit(100_000))
            ),
        )
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.pmod(F.xxhash64("id"), F.lit(k)).cast("long").alias("cluster"),
            normalized_col(vec).alias("e"),
        )

    prev = {"semdedup_cell2k": None, "semdedup_fixedk": None}
    for copies in (1, 2, 4):
        n = n0 * copies
        a_grow = assigned(n, n // cell).repartition(32).persist()
        a_fix = assigned(n, n0 // cell).repartition(32).persist()
        a_grow.count(), a_fix.count()

        def op_grow(_):
            return (
                semdedup_keep_first(a_grow, threshold=0.3, vec_col="e")
                .filter("kept")
                .count()
            )

        def op_fix(_):
            return (
                semdedup_keep_first(a_fix, threshold=0.3, vec_col="e")
                .filter("kept")
                .count()
            )

        _timed(
            {"semdedup_cell2k": op_grow, "semdedup_fixedk": op_fix},
            None,
            prev,
            copies,
        )
        a_grow.unpersist(blocking=True)
        a_fix.unpersist(blocking=True)
        print()


def pip_probe(spark) -> None:
    """Banded point-in-polygon assignment (the geo_locality_assign
    plan shape) vs the broadcast BNLJ raycast, with POINTS AND RING
    COUNT both doubling over a growing territory (constant ring
    density — the regime a growing locality layer lives in). BNLJ
    work = |P|·|E| → ~x4 per doubling of both; the banded equi-join
    probes only the edges sharing the point's 1° latitude band → ~x2
    (per-point edge load constant). Rings: 8-vertex notched
    staircases, one per 1° latitude stripe; points uniform over the
    covered stripes (xxhash-deterministic). BNLJ runs at every scale
    — its quadratic is invisible until ~10^10 evaluations (vectorized
    codegen), so the probe climbs to 8x to expose it."""
    n0, r0 = 200_000, 160

    def rings(nrings: int):
        rows = []
        for r in range(nrings):
            y0 = float(r)
            ring = [
                (140.0, y0 + 0.05),
                (150.0, y0 + 0.05),
                (150.0, y0 + 0.95),
                (146.0, y0 + 0.95),
                (146.0, y0 + 0.45),
                (144.0, y0 + 0.45),
                (144.0, y0 + 0.95),
                (140.0, y0 + 0.95),
            ]
            for i in range(len(ring)):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % len(ring)]
                rows.append((r, i, x1, y1, x2, y2))
        return rows

    on = (
        "((e.y1 > p.lat) <> (e.y2 > p.lat)) AND "
        "(p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)"
    )

    prev = {"pip_banded": None, "pip_bnlj": None}
    for copies in (1, 2, 4, 8):
        n, nr = n0 * copies, r0 * copies
        h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1_000_000))
        h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(13)), F.lit(1_000_000))
        pts = (
            spark.range(n)
            .select(
                F.col("id").alias("point_id"),
                (h1 / 1_000_000.0 * nr).alias("lat"),
                (139.0 + h2 / 1_000_000.0 * 12.0).alias("lon"),
            )
            .repartition(32)
            .persist()
        )
        pts.count()
        edge_rows = rings(nr)
        e_plain = spark.createDataFrame(
            edge_rows, "rid int, eid int, x1 double, y1 double, x2 double, y2 double"
        )
        # Same band explosion as the production queries (edge_band_rows
        # covers every band in an edge's y-span, not just one endpoint's
        # band) so probe and plan can't drift if the ring shape changes.
        band_rows = edge_band_rows(edge_rows, 1.0)
        e_band = spark.createDataFrame(
            band_rows,
            "band long, rid int, eid int, x1 double, y1 double, x2 double, y2 double",
        )

        def op_banded(_):
            p = pts.withColumn("band", F.floor(F.col("lat")).cast("long")).alias("p")
            return (
                p.join(
                    F.broadcast(e_band).alias("e"),
                    (F.col("p.band") == F.col("e.band")) & F.expr(on),
                )
                .groupBy("p.point_id", "e.rid")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") % 2 == 1)
                .count()
            )

        def op_bnlj(_):
            p = pts.alias("p")
            return (
                p.join(F.broadcast(e_plain).alias("e"), F.expr(on))
                .groupBy("p.point_id", "e.rid")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") % 2 == 1)
                .count()
            )

        _timed({"pip_banded": op_banded, "pip_bnlj": op_bnlj}, None, prev, copies)
        pts.unpersist(blocking=True)
        print()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    family = sys.argv[2] if len(sys.argv) > 2 else "all"
    spark = get_spark(app_name="scale-probe")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    if family == "graph":
        graph_probe(spark, sf_dir)
        return
    if family == "ann":
        ann_probe(spark)
        return
    if family == "spatial":
        spatial_probe(spark)
        return
    if family == "temporal":
        temporal_probe(spark)
        return
    if family == "fuzzy":
        fuzzy_probe(spark)
        return
    if family == "fuzzy_link":
        fuzzy_link_probe(spark)
        return
    if family == "pip":
        pip_probe(spark)
        return
    if family == "semdedup":
        semdedup_probe(spark)
        return
    base = load(spark, sf_dir, "documents")

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        duplicated_token_spans,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingle_postings,
    )

    def op_minhash(d):
        # postings feed ONLY the signature leg here (unlike the real
        # dedup_minhash_estimate query) — no checkpoint needed
        sigs = minhash_signatures(d, "doc_id", "text", num_hashes=16, shingle_n=2)
        return lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=4).count()

    def op_spans(d):
        return duplicated_token_spans(d, "doc_id", "text", k=8).count()

    def op_jaccard(d):
        return ngram_jaccard_pairs(
            d, id_col="doc_id", text_col="text", threshold=0.5, shingle_n=3
        ).count()

    ops = {"minhash_lsh": op_minhash, "substring_spans": op_spans, "ngram_jaccard": op_jaccard}

    # scale-outer loop: each scaled corpus is persisted ONCE, shared
    # by every operator at that scale, and unpersisted before the next
    # scale — otherwise 9 corpus copies pile up in executor storage and
    # the later operators are timed under accumulated memory pressure.
    prev_dt = {name: None for name in ops}
    for copies in (1, 2, 4):
        d = scaled_docs(base, copies)
        for name, fn in ops.items():
            fn(d)  # warm (plan + JIT)
            t0 = time.perf_counter()
            rows = fn(d)
            dt = time.perf_counter() - t0
            p = prev_dt[name]
            factor = "" if p is None else f"  x{dt / p:.2f} per doubling"
            print(f"{name:16s} {copies}x  rows={rows:>9}  {dt:6.2f}s{factor}")
            prev_dt[name] = dt
        d.unpersist(blocking=True)
        spark._jvm.System.gc()
        print()
    if family == "all":
        graph_probe(spark, sf_dir)
        ann_probe(spark)


if __name__ == "__main__":
    main()
