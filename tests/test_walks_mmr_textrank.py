"""Semantics tests for the round-13 retrieval/graph additions —
deterministic walks (edge-validity + reproducibility), MMR rerank
(diversity actually improves over naive top-k), TextRank (scores are
a proper distribution-ish centrality, top node is degree-central),
and Adamic-Adar (hub discount: AA ranks differently from raw cooc).
Parity vs DuckDB is covered by the registry harness."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_walks_follow_real_edges_and_are_reproducible(spark):
    out1 = QUERIES["graph_deterministic_walks"](spark, SF_DIR)
    rows1 = sorted(tuple(r) for r in out1.collect())
    rows2 = sorted(
        tuple(r) for r in QUERIES["graph_deterministic_walks"](spark, SF_DIR).collect()
    )
    assert rows1 == rows2 and rows1  # hash coins: bit-reproducible
    # every consecutive hop must be a real edge of the c<->s graph
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs = {
        (f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}")
        for r in orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    }
    edges = pairs | {(b, a) for a, b in pairs}
    for start, h1, h2, h3 in rows1:
        assert (start, h1) in edges
        assert (h1, h2) in edges
        assert (h2, h3) in edges
        # bipartite graph: hops alternate sides
        assert start.startswith("s:") and h1.startswith("c:")
        assert h2.startswith("s:") and h3.startswith("c:")


def test_mmr_is_more_diverse_than_naive_topk(spark):
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _MMR_K,
        _MMR_QID,
    )

    out = QUERIES["sim_mmr_rerank"](spark, SF_DIR).collect()
    assert [r["sel_rank"] for r in sorted(out, key=lambda r: r["sel_rank"])] == list(
        range(1, _MMR_K + 1)
    )
    # relevance of pick 1 is the max relevance (pure-relevance first pick)
    by_rank = sorted(out, key=lambda r: r["sel_rank"])
    assert by_rank[0]["relevance"] == max(r["relevance"] for r in out)
    # diversity: avg pairwise cosine of the MMR set is <= that of the
    # naive top-k (same k, pure relevance order)
    import itertools

    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def avg_pairwise(ids):
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return d / (na * nb)

        sims = [
            cos(emb[i], emb[j]) for i, j in itertools.combinations(sorted(ids), 2)
        ]
        return sum(sims) / len(sims)

    q = emb[_MMR_QID]

    def cosq(v):
        d = sum(x * y for x, y in zip(q, v))
        return d / (
            (sum(x * x for x in q) ** 0.5) * (sum(x * x for x in v) ** 0.5)
        )

    naive = [
        i
        for i, _ in sorted(
            ((i, cosq(v)) for i, v in emb.items() if i != _MMR_QID),
            key=lambda t: (-t[1], t[0]),
        )[:_MMR_K]
    ]
    mmr_ids = [r["vec_id"] for r in out]
    assert avg_pairwise(mmr_ids) <= avg_pairwise(naive) + 1e-9


def test_textrank_scores_positive_and_topk_ordered(spark):
    rows = QUERIES["text_textrank_keywords"](spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    by_rnk = sorted(rows, key=lambda r: r["rnk"])
    ranks = [r["rank"] for r in by_rnk]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank"] > 0 for r in rows)


def test_adamic_adar_discounts_hub_customers(spark):
    """AA and raw cooc must disagree somewhere (the hub discount is
    real), and jaccard stays in (0, 1]."""
    rows = QUERIES["graph_adamic_adar_linkpred"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["adamic_adar"] > 0.0
    by_cooc = sorted(rows, key=lambda r: (-r["cooc"], r["u"], r["v"]))
    by_aa = sorted(rows, key=lambda r: (-r["adamic_adar"], r["u"], r["v"]))
    if len(rows) > 3:
        assert [
            (r["u"], r["v"]) for r in by_cooc
        ] != [(r["u"], r["v"]) for r in by_aa]


def test_node2vec_walks_follow_edges_and_alternate_sides(spark):
    """Second-order walks: same edge-validity/reproducibility contract
    as the first-order operator, over the same bipartite graph."""
    rows1 = sorted(
        tuple(r) for r in QUERIES["graph_node2vec_walks"](spark, SF_DIR).collect()
    )
    rows2 = sorted(
        tuple(r) for r in QUERIES["graph_node2vec_walks"](spark, SF_DIR).collect()
    )
    assert rows1 == rows2 and rows1
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs = {
        (f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}")
        for r in orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    }
    edges = pairs | {(b, a) for a, b in pairs}
    for start, h1, h2, h3 in rows1:
        assert (start, h1) in edges and (h1, h2) in edges and (h2, h3) in edges
        assert start.startswith("s:") and h2.startswith("s:")
        assert h1.startswith("c:") and h3.startswith("c:")


def test_node2vec_bias_replays_python_mini_oracle(spark):
    """The p,q bias is PINNED: on a toy triangle+tail graph a Python
    replay of the exact algebra (md5 coin, integer weights 1/4/2 for
    return/common/far, dst-sorted cumulative inversion) must equal
    node2vec_walk_frame hop for hop — and the replay must hit at least
    one mixed-weight state, so all three bias arms are exercised."""
    import hashlib
    from collections import defaultdict

    from cam_location_addressing_feature_service_etl_spark.workload.graph import (
        node2vec_walk_frame,
    )

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    eset = set(und) | {(y, x) for x, y in und}
    adj = defaultdict(list)
    for x, y in sorted(eset):
        adj[x].append(y)
    steps, seed = 4, "toyseed"

    def replay(start):
        cur, prev, hops = start, None, []
        mixed = 0
        for t in range(1, steps + 1):
            nbrs = sorted(adj[cur])
            wts = [
                1 if prev is None
                else 1 if x == prev
                else 4 if (prev, x) in eset
                else 2
                for x in nbrs
            ]
            if len(set(wts)) > 1:
                mixed += 1
            h = hashlib.md5(
                f"{seed}:{start}:{t}:{cur}:{prev or '-'}".encode()
            ).hexdigest()
            c = int(h[:8], 16) % sum(wts)
            cum = 0
            for x, w in zip(nbrs, wts):
                cum += w
                if c < cum:
                    nxt = x
                    break
            hops.append(nxt)
            prev, cur = cur, nxt
        return tuple(hops), mixed

    starts = sorted(adj)
    want, total_mixed = {}, 0
    for s in starts:
        hops, mixed = replay(s)
        want[s] = hops
        total_mixed += mixed
    assert total_mixed > 0  # the bias arms actually fired

    edges_df = spark.createDataFrame(sorted(eset), "src string, dst string")
    starts_df = spark.createDataFrame([(s,) for s in starts], "start string")
    got = {
        r["start"]: tuple(r[f"hop{i}"] for i in range(1, steps + 1))
        for r in node2vec_walk_frame(edges_df, starts_df, steps, seed).collect()
    }
    assert got == want


def test_mmr_fold_matches_join_window_form(spark):
    """``mmr_greedy_col`` (the r16 map-side fold) must reproduce the
    literal pre-r16 per-step join/window greedy loop bit-for-bit on
    the real smoke embeddings — same guard discipline as
    ``test_array_argmin_matches_window_form`` for the kmeans argmin."""
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        as_double_array,
        cosine_col,
    )
    from cam_location_addressing_feature_service_etl_spark.runtime import materialize
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _MMR_CAND,
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_ONE_MINUS,
        _MMR_QID,
    )

    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    v = embeddings.select("vec_id", as_double_array(F.col("embedding")).alias("e"))
    q = v.filter(F.col("vec_id") == _MMR_QID).select(F.col("e").alias("qe"))
    cand = (
        v.filter(F.col("vec_id") != _MMR_QID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "e",
            F.round(cosine_col(F.col("e"), F.col("qe")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_CAND)
        .transform(materialize)
    )
    # --- the literal pre-r16 loop: per-step anti-join + broadcast
    # BNLJ + grouped max + TakeOrdered(1), eager checkpoint per step
    selected = (
        cand.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("sel_rank"),
            "vec_id",
            "e",
            "rel",
            F.col("rel").alias("mmr_score"),
        )
        .transform(materialize)
    )
    for i in range(2, _MMR_K + 1):
        sel_vecs = selected.select(
            F.col("vec_id").alias("sid"), F.col("e").alias("se")
        )
        mx = (
            cand.join(sel_vecs, cand["vec_id"] == sel_vecs["sid"], "left_anti")
            .crossJoin(F.broadcast(sel_vecs))
            .select(
                "vec_id",
                "e",
                "rel",
                F.round(cosine_col(F.col("e"), F.col("se")), 6).alias("sim"),
            )
            .groupBy("vec_id", "rel")
            .agg(F.first("e").alias("e"), F.max("sim").alias("m"))
        )
        pick = (
            mx.select(
                F.lit(i).cast("long").alias("sel_rank"),
                "vec_id",
                "e",
                "rel",
                F.round(
                    F.lit(_MMR_LAMBDA) * F.col("rel")
                    - F.lit(_MMR_ONE_MINUS) * F.col("m"),
                    6,
                ).alias("mmr_score"),
            )
            .orderBy(F.desc("mmr_score"), F.asc("vec_id"))
            .limit(1)
        )
        selected = selected.unionByName(pick).transform(materialize)
        selected.count()
    old = sorted(
        (r["sel_rank"], r["vec_id"], r["rel"], r["mmr_score"])
        for r in selected.collect()
    )
    new = sorted(
        (r["sel_rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        for r in QUERIES["sim_mmr_rerank"](spark, SF_DIR).collect()
    )
    assert len(old) == _MMR_K
    assert new == old  # exact float equality: bit-for-bit trajectory
