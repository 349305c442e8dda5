"""Property-based tests (hypothesis) for the operator invariants the
reference relies on implicitly: upsert key-uniqueness, surrogate-id
density/stability, dedup precedence, and LSH-vs-exact consistency."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    dedup_first_wins,
    merge_fetched_wins,
)
from cam_location_addressing_feature_service_etl_spark.operators.id_map import (
    assign_surrogate_ids,
)
from cam_location_addressing_feature_service_etl_spark.operators.upsert import (
    upsert_by_key,
)

_SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=25)


@given(base_keys=keys, update_keys=keys)
@_SET
def test_upsert_invariants(spark, base_keys, update_keys):
    base = spark.createDataFrame(
        [(k, f"base-{k}") for k in set(base_keys)] or [(None, None)], "key int, val string"
    ).filter(F.col("key").isNotNull())
    updates = spark.createDataFrame(
        [(k, f"upd-{k}") for k in set(update_keys)] or [(None, None)], "key int, val string"
    ).filter(F.col("key").isNotNull())
    merged = {r["key"]: r["val"] for r in upsert_by_key(base, updates, ["key"]).collect()}
    # keys = union; updates always win; untouched base rows survive
    assert set(merged) == set(base_keys) | set(update_keys)
    for k in set(update_keys):
        assert merged[k] == f"upd-{k}"
    for k in set(base_keys) - set(update_keys):
        assert merged[k] == f"base-{k}"


@given(
    run1=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), max_size=15),
    run2=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), max_size=15),
)
@_SET
def test_surrogate_ids_dense_and_stable(spark, run1, run2):
    empty = spark.createDataFrame([], "iri string, id long")
    k1 = spark.createDataFrame([(k,) for k in run1] or [(None,)], "iri string").filter(
        F.col("iri").isNotNull()
    )
    m1 = assign_surrogate_ids(k1, empty)
    ids1 = {r["iri"]: r["id"] for r in m1.collect()}
    assert sorted(ids1.values()) == list(range(1, len(set(run1)) + 1))  # dense from 1
    k2 = spark.createDataFrame([(k,) for k in run1 + run2] or [(None,)], "iri string").filter(
        F.col("iri").isNotNull()
    )
    m2 = assign_surrogate_ids(k2, m1)
    ids2 = {r["iri"]: r["id"] for r in m2.collect()}
    assert all(ids2[k] == v for k, v in ids1.items())  # stability
    assert sorted(ids2.values()) == list(range(1, len(set(run1) | set(run2)) + 1))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
@_SET
def test_first_wins_dedup_picks_minimum(spark, rows):
    df = spark.createDataFrame(rows, "k int, a int, b int")
    got = {
        r["k"]: (r["a"], r["b"])
        for r in dedup_first_wins(df, ["k"], ["a", "b"]).collect()
    }
    expect = {}
    for k, a, b in rows:
        if k not in expect or (a, b) < expect[k]:
            expect[k] = (a, b)
    assert got == expect


@given(overlap=st.lists(st.integers(0, 20), min_size=1, max_size=15))
@_SET
def test_fetched_wins_on_every_collision(spark, overlap):
    stored = spark.createDataFrame(
        [(k, "stored", 0) for k in set(overlap)], "key int, src string, pri int"
    )
    fetched = spark.createDataFrame(
        [(k, "fetched", 1) for k in set(overlap)], "key int, src string, pri int"
    )
    merged = merge_fetched_wins(stored, fetched, ["key"], "pri")
    assert all(r["src"] == "fetched" for r in merged.collect())


# ---------------------------------------------------------------------------
# as-of join vs pandas.merge_asof (the canonical reference semantics)
# ---------------------------------------------------------------------------

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user key
        st.integers(min_value=0, max_value=50),     # ts (seconds, MANY ties)
        st.integers(min_value=0, max_value=999),    # value payload
    ),
    min_size=0,
    max_size=30,
)


@given(left_rows=_asof_events, right_rows=_asof_events)
@_SET
def test_merge_asof_matches_pandas(spark, left_rows, right_rows):
    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.operators.asof import (
        merge_asof,
    )

    # unique event ids; right_seq = event_id so tie-breaking is
    # deterministic on both sides
    left = [(i, k, ts * 1_000_000) for i, (k, ts, _) in enumerate(left_rows)]
    right = [
        (1000 + i, k, ts * 1_000_000, float(v))
        for i, (k, ts, v) in enumerate(right_rows)
    ]
    ldf = spark.createDataFrame(
        left or [(None, None, None)], "event_id long, user_id long, us long"
    ).filter(F.col("event_id").isNotNull()).select(
        "event_id", "user_id", F.timestamp_micros("us").alias("ts")
    )
    rdf = spark.createDataFrame(
        right or [(None, None, None, None)],
        "event_id long, user_id long, us long, value double",
    ).filter(F.col("event_id").isNotNull()).select(
        "event_id", "user_id", F.timestamp_micros("us").alias("ts"), "value"
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in merge_asof(
            ldf, rdf, on="user_id", left_ts="ts", right_ts="ts",
            right_seq="event_id", payload=["value"],
        ).collect()
    }

    lp = pd.DataFrame(left, columns=["event_id", "user_id", "us"])
    rp = pd.DataFrame(right, columns=["event_id", "user_id", "us", "value"])
    # pandas.merge_asof backward + allow_exact_matches picks the LAST
    # right row in sort order among ties; sorting by (us, event_id)
    # makes that the highest event_id — our documented tie-break
    if len(lp) and len(rp):
        expected_df = pd.merge_asof(
            lp.sort_values(["us", "event_id"]).reset_index(drop=True),
            rp.sort_values(["us", "event_id"]).reset_index(drop=True),
            on="us",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        expected = {
            int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in expected_df.itertuples()
        }
    else:
        expected = {int(e): None for e, _, _ in left}
    assert got == expected


# ---------------------------------------------------------------------------
# time-salted sessionization vs unsalted on arbitrary gap patterns
# ---------------------------------------------------------------------------


@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=7200),  # seconds between events
        min_size=1,
        max_size=40,
    ),
    bucket_s=st.sampled_from([600, 1800, 3600, 7200]),
)
@_SET
def test_sessionize_salted_matches_unsalted_property(spark, gaps, bucket_s):
    from pyspark.sql.window import Window

    from cam_location_addressing_feature_service_etl_spark.operators.sessionize import (
        sessionize_time_salted,
    )

    base = 1_700_000_000
    ts, rows = base, []
    for i, g in enumerate(gaps):
        ts += g
        rows.append((i, 0, ts * 1_000_000))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))

    gap_ms = 30 * 60_000
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_sum = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["event_id"]: r["session_idx"]
        for r in df.withColumn("prev", F.lag("ts").over(w_lag))
        .withColumn(
            "new",
            F.when(
                F.col("prev").isNull()
                | (F.unix_millis("ts") - F.unix_millis("prev") > gap_ms),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new").over(w_sum))
        .collect()
    }
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize_time_salted(
            df, gap_ms=gap_ms, bucket_ms=bucket_s * 1000
        ).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# probabilistic-dedup guarantees: simhash chunk-index exactness, MinHash/LSH
# banding equivalence + identical-doc recall, prefix-filter equivalence
# ---------------------------------------------------------------------------


@given(
    hashes=st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1), min_size=0, max_size=20),
    max_dist=st.sampled_from([1, 2]),
)
@_SET
def test_simhash_chunk_index_equals_bruteforce_hamming(spark, hashes, max_dist):
    """simhash_pairs_exact claims EXACTNESS (Manku pigeonhole): its
    output must equal the brute-force all-pairs hamming scan — every
    pair within max_dist found, none beyond it, correct distances."""
    from itertools import combinations

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        simhash_pairs_exact,
    )

    rows = [(i, h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows or [(None, None)], "id long, simhash long").filter(
        F.col("id").isNotNull()
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_exact(df, "id", "simhash", bits=16, max_dist=max_dist).collect()
    }
    expect = {
        (i, j): bin(hi ^ hj).count("1")
        for (i, hi), (j, hj) in combinations(rows, 2)
        if bin(hi ^ hj).count("1") <= max_dist
    }
    assert got == expect


_vocab_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=3,
    max_size=10,
)


@given(
    docs=st.lists(_vocab_doc, min_size=1, max_size=10),
    dup_of=st.integers(min_value=0, max_value=9),
)
@_SET
def test_lsh_banding_equivalence_and_identical_doc_recall(spark, docs, dup_of):
    """Two guarantees for MinHash+LSH: (a) the banding/bucket join is
    EXACTLY 'pairs agreeing on >= 1 full signature band' — verified
    against a Python recomputation from the collected signatures; (b)
    an exact duplicate (same shingle set) has an identical signature,
    so it is ALWAYS a candidate — the J=1 point of the S-curve, the
    only per-instance-deterministic recall bound."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # plant an exact duplicate of one doc at a fresh id
    dup_src = dup_of % len(docs)
    corpus = [(i, " ".join(d)) for i, d in enumerate(docs)]
    dup_id = len(docs)
    corpus.append((dup_id, " ".join(docs[dup_src])))
    df = spark.createDataFrame(corpus, "id long, text string")

    num_hashes, bands = 8, 4
    sigs = minhash_signatures(df, "id", "text", num_hashes=num_hashes, shingle_n=3)
    sig_rows = {r["id"]: [r[f"h{i}"] for i in range(num_hashes)] for r in sigs.collect()}
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, "id", num_hashes=num_hashes, bands=bands).collect()
    }

    rpb = num_hashes // bands
    expect = set()
    ids = sorted(sig_rows)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            sa, sb = sig_rows[ids[ai]], sig_rows[ids[bi]]
            if any(
                sa[b * rpb : (b + 1) * rpb] == sb[b * rpb : (b + 1) * rpb]
                for b in range(bands)
            ):
                expect.add((ids[ai], ids[bi]))
    assert got == expect  # (a) banding is exactly band-agreement

    # (b) identical-shingle-set docs are always candidates (if the doc
    # produced shingles at all: < 3 tokens after normalization -> no
    # signature row, no recall claim)
    if dup_src in sig_rows and dup_id in sig_rows:
        assert (dup_src, dup_id) in got


@given(
    docs=st.lists(_vocab_doc, min_size=1, max_size=12),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@_SET
def test_prefix_jaccard_equals_naive_jaccard(spark, docs, threshold):
    """ngram_jaccard_pairs_prefix claims the prefix/length/positional
    filters are LOSSLESS: its output (pairs AND jaccard values) must
    equal the naive inverted-index variant on any corpus."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "id long, text string"
    )
    naive = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "id", "text", threshold, shingle_n=3).collect()
    }
    prefix = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(df, "id", "text", threshold, shingle_n=3).collect()
    }
    assert prefix == naive


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
        min_size=0,
        max_size=20,
    )
)
@_SET
def test_star_cc_equals_union_find(spark, edges):
    """connected_components_star claims the converged components of an
    arbitrary undirected graph — verified against a Python union-find
    ground truth (label = component minimum, nodes incident to >=1
    non-loop edge)."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        connected_components_star,
    )

    real = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(real or [(None, None)], "id_a long, id_b long").filter(
        F.col("id_a").isNotNull()
    )
    got = {(r["node"], r["label"]) for r in connected_components_star(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real:
        parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    expect = {(n, min(members)) for members in comps.values() for n in members}
    assert got == expect


_vec4 = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False, allow_infinity=False, width=32),
    min_size=4,
    max_size=4,
)


@given(vecs=st.lists(_vec4, min_size=3, max_size=10))
@_SET
def test_pq_codes_equal_bruteforce_argmin(spark, vecs):
    """pq_codes must agree with a Python brute-force argmin over the
    same micro-unit integer metric (ties to the smaller code) for
    arbitrary float vectors."""
    import math

    from cam_location_addressing_feature_service_etl_spark.operators.factorization import (
        micro_components,
        pq_codes,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    x = micro_components(df, "vec_id", "embedding")
    got = {
        (r["vec_id"], r["subspace"]): (r["code"], r["dist_sq"])
        for r in pq_codes(x, codebook_ids=2, sub_dims=2).collect()
    }

    def micro(v):
        # float32 storage then float64 widening, same as the engine
        import struct

        return [
            math.floor(struct.unpack("f", struct.pack("f", c))[0] * 1_000_000 + 0.5)
            for c in v
        ]

    mvecs = {i: micro(v) for i, v in rows}
    for i, _ in rows:
        for s in (0, 1):
            dists = []
            for code in (0, 1):
                d = sum(
                    (mvecs[i][k] - mvecs[code][k]) ** 2 for k in (2 * s, 2 * s + 1)
                )
                dists.append((d, code))
            want = min(dists)
            assert got[(i, s)] == (want[1], want[0])


@given(
    data=st.lists(
        st.lists(st.integers(min_value=-5, max_value=5), min_size=4, max_size=4),
        min_size=14,
        max_size=26,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_ivf_recall_contains_probed_true_neighbors(spark, data):
    """ivf_search is EXACT over the probed candidate set: every true
    (brute-force) top-k neighbor whose cell is probed must be returned,
    and recall is monotonically non-decreasing in nprobe (a superset
    candidate pool can only retain more of the true top-k)."""
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        as_double_array,
        brute_force_topk,
        dot_col,
        ivf_assign,
        ivf_search,
        norm_col,
    )

    vecs = [(i, [float(x) for x in v]) for i, v in enumerate(data) if any(v)]
    if len(vecs) < 10:
        return
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    n_cent, k = 3, 3
    ids = sorted(i for i, _ in vecs)
    cent_ids, member_ids = set(ids[:n_cent]), ids[n_cent:]
    centroids = df.filter(F.col("vec_id").isin(list(cent_ids)))
    members = df.filter(~F.col("vec_id").isin(list(cent_ids)))
    queries = df.filter(F.col("vec_id").isin(member_ids[:3]))

    true_k = {}
    for r in brute_force_topk(members, queries, k).collect():
        true_k.setdefault(r["query_id"], []).append(r["neighbor_id"])
    cells = {
        r["vec_id"]: r["centroid_id"] for r in ivf_assign(members, centroids).collect()
    }
    # probe ranking, same expressions as ivf_search
    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), as_double_array(F.col("embedding")).alias("cv")
    ).withColumn("cn", norm_col(F.col("cv")))
    q = queries.select(
        F.col("vec_id").alias("query_id"), as_double_array(F.col("embedding")).alias("qv")
    ).withColumn("qn", norm_col(F.col("qv")))
    from pyspark.sql.window import Window as W

    pw = W.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("centroid_id"))
    probe_rows = (
        q.crossJoin(F.broadcast(c))
        .select(
            "query_id",
            "centroid_id",
            F.round(
                dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("pcos"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .collect()
    )
    probes = {}
    for r in probe_rows:
        probes.setdefault(r["query_id"], {})[r["rn"]] = r["centroid_id"]

    recalls = {}
    for nprobe in (1, 2):
        got = {}
        for r in ivf_search(members, centroids, queries, k, nprobe=nprobe).collect():
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        for qid, truth in true_k.items():
            probed = {probes[qid][rn] for rn in range(1, nprobe + 1) if rn in probes[qid]}
            reachable = [n for n in truth if cells.get(n) in probed]
            missing = set(reachable) - set(got.get(qid, []))
            assert missing == set(), (
                f"nprobe={nprobe}: true neighbors {missing} of query {qid} live "
                f"in probed cells but were not returned"
            )
        recalls[nprobe] = {
            qid: len(set(truth) & set(got.get(qid, []))) / len(truth)
            for qid, truth in true_k.items()
            if truth
        }
    for qid in recalls[1]:
        assert recalls[2][qid] >= recalls[1][qid], (
            f"recall regressed with more probes for query {qid}: "
            f"{recalls[1][qid]} -> {recalls[2][qid]}"
        )


def test_ivf_recall_rate_report(spark):
    """Deterministic recall measurement on the sf0.001 embeddings:
    nprobe=2 recall must be >= nprobe=1 recall (reported in the assert
    message for the record)."""
    from cam_location_addressing_feature_service_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_search,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = df.filter(F.col("vec_id") < 8)
    members = df.filter(F.col("vec_id") >= 8)
    queries = members.filter(F.col("vec_id") < 24)
    k = 5
    truth = {}
    for r in brute_force_topk(members, queries, k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rates = {}
    for nprobe in (1, 2):
        got = {}
        for r in ivf_search(members, centroids, queries, k, nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        rates[nprobe] = hits / sum(len(v) for v in truth.values())
    assert rates[2] >= rates[1], rates
    assert rates[2] > 0, rates
    print(f"IVF recall@{k}: nprobe=1 {rates[1]:.3f}, nprobe=2 {rates[2]:.3f}")


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=12),
                  st.integers(min_value=0, max_value=12)),
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered triangle counting equals brute-force enumeration
    on arbitrary graphs (self-loops and duplicate/reversed edges
    tolerated)."""
    from itertools import combinations

    from cam_location_addressing_feature_service_etl_spark.operators.triangles import (
        triangle_counts_per_node,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    expected: dict[int, int] = {}
    nodes = {n for e in canon for n in e}
    for u, v, w in combinations(sorted(nodes), 3):
        if {(u, v), (u, w), (v, w)} <= canon:
            for n in (u, v, w):
                expected[n] = expected.get(n, 0) + 1

    df = spark.createDataFrame(
        list(edges) or [(None, None)], "id_a long, id_b long"
    ).filter(F.col("id_a").isNotNull())
    got = {
        r["node"]: r["triangles"] for r in triangle_counts_per_node(df).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# k-core peel vs a pure-Python reference peel
# ---------------------------------------------------------------------------

_kcore_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
)


def _py_kcore(pairs, k, rounds):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for _ in range(rounds):
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


@given(pairs=_kcore_edges, k=st.integers(1, 4))
@_SET
def test_kcore_peel_matches_python_reference(spark, pairs, k):
    from cam_location_addressing_feature_service_etl_spark.operators.kcore import (
        kcore_peel,
    )

    rounds = 3
    df = spark.createDataFrame(
        pairs or [(None, None)], "id_a int, id_b int"
    ).filter(F.col("id_a").isNotNull())
    got = {r["node"]: r["degree"] for r in kcore_peel(df, k, rounds).collect()}
    assert got == _py_kcore(pairs, k, rounds)


# ---------------------------------------------------------------------------
# duplicated_token_spans vs a pure-Python k-gram-run reference
# ---------------------------------------------------------------------------

_span_docs = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
    min_size=1,
    max_size=5,
)


def _py_spans(docs, k):
    grams = {}
    for did, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            grams.setdefault(tuple(toks[p : p + k]), []).append((did, p + 1))
    dup = {g for g, occ in grams.items() if len(occ) > 1}
    out = set()
    for did, toks in enumerate(docs):
        starts = [
            p + 1
            for p in range(len(toks) - k + 1)
            if tuple(toks[p : p + k]) in dup
        ]
        run = []
        for s in starts:
            if run and s - run[-1] <= k:
                run.append(s)
            else:
                if run:
                    out.add((did, run[0], run[-1] + k - 1, run[-1] + k - run[0]))
                run = [s]
        if run:
            out.add((did, run[0], run[-1] + k - 1, run[-1] + k - run[0]))
    return out


@given(docs=_span_docs, k=st.integers(2, 4))
@_SET
def test_duplicated_token_spans_matches_python_reference(spark, docs, k):
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        duplicated_token_spans,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_token_spans(df, "doc_id", "text", k=k).collect()
    }
    assert got == _py_spans(docs, k)


# ---------------------------------------------------------------------------
# Tokenizer equivalence: tokens_col vs the DuckDB TOKENS_SQL fragment
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet="abcXYZ019 .,;:!?'\"-_/\\\n\téÆ中",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=_texts)
@_SET
def test_tokenizer_matches_duckdb_fragment(spark, texts):
    """tokens_col and TOKENS_SQL are THE shared primitive of the whole
    text family — every oracle assumes they agree bit-for-bit on
    arbitrary input (punctuation runs, unicode, tabs, empties)."""
    import duckdb

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        tokens_col,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
        TOKENS_SQL,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id", tokens_col(F.col("text")).alias("toks")).collect()
    }
    con = duckdb.connect()
    frag = TOKENS_SQL.format(col="?")
    want = {
        i: con.execute(f"SELECT {frag.replace('?', '$1')} ", [t]).fetchone()[0]
        for i, t in enumerate(texts)
    }
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 oracle/engine agreement under (user_id, ts) ties
# ---------------------------------------------------------------------------

_tie_events = st.lists(
    st.tuples(
        st.integers(0, 2),            # user_id
        st.integers(0, 3),            # ts offset minutes (DUPLICATES likely)
        st.sampled_from(["view", "click", "error"]),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=_tie_events)
@_SET
def test_scd2_engine_matches_oracle_under_ts_ties(spark, rows, tmp_path_factory):
    """Events sharing an identical (user_id, ts) must still produce
    identical SCD2 intervals in both engines: every window orders by
    (ts, event_id) on both sides (the round-6 oracle tie fix)."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _SCD2_ORACLE,
        ev_scd2_state_intervals,
    )

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (eid, t0 + dt.timedelta(minutes=off), uid, et, 1.0, "{}")
        for eid, (uid, off, et) in enumerate(rows)
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    sf = str(tmp_path_factory.mktemp("scd2ties"))
    spark.createDataFrame(data, cols).write.parquet(f"{sf}/events.parquet")

    got = ev_scd2_state_intervals(spark, sf).toPandas()
    con = duckdb.connect()
    con.register("events", pd.DataFrame(data, columns=cols))
    want = con.execute(_SCD2_ORACLE).fetchdf()

    # compare full-row MULTISETS: under ts ties two runs can share
    # (user, state, valid_from, n_events) and differ only in valid_to,
    # so any column-wise compare after an under-specified sort is
    # nondeterministic even when the engines agree
    def rows_of(pdf):
        return sorted(
            (
                int(r.user_id),
                r.state,
                r.valid_from,
                r.valid_to if isinstance(r.valid_to, str) else "",
                bool(r.is_current),
                int(r.n_events),
            )
            for r in pdf.itertuples()
        )

    assert rows_of(got) == rows_of(want)


def test_desc_topk_key_must_be_numeric(spark):
    """ADVICE r07: a DESC key of non-numeric type would be silently
    negated-to-double (all null) — the guard raises instead."""
    import pytest
    from pyspark.sql import functions as F

    from cam_location_addressing_feature_service_etl_spark.operators.topk import (
        DESC,
        global_topk_ranked,
    )

    df = spark.createDataFrame([("b", 1), ("a", 2)], "s string, v int")
    with pytest.raises(TypeError, match="non-numeric"):
        global_topk_ranked(df, [(F.col("s"), DESC)], 2, ["s", "v"])
    # numeric DESC still works
    got = global_topk_ranked(df, [(F.col("v"), DESC)], 2, ["s", "v"]).collect()
    assert [r["s"] for r in sorted(got, key=lambda r: r["rnk"])] == ["a", "b"]


def test_near_dup_edges_gate_picks_branch_and_output_invariant(spark):
    """near_dup_edges (r14): the measured df-profile gate must pick the
    prefix stage on a boilerplate corpus (hot head dominates collision
    volume) and the naive stage on a rich-vocabulary corpus — and BOTH
    branches must emit the identical exact pair set (the gate is pure
    economics, never semantics)."""
    import cam_location_addressing_feature_service_etl_spark.operators.dedup as dd

    footer = (
        " shared footer terms of service all rights reserved"
        " privacy policy applies to every document"
    )
    # 40 rich-vocab docs + 5 near-dup variants of docs 0..4
    base = [
        (i, " ".join(f"t{i}x{j}" for j in range(30)))
        for i in range(40)
    ]
    variants = [
        (100 + i, " ".join(f"t{i}x{j}" for j in range(28)))
        for i in range(5)
    ]
    rich = spark.createDataFrame(base + variants, "id long, text string")
    boiler = rich.selectExpr("id", f"text || '{footer}' AS text")

    calls: list[str] = []
    orig_naive, orig_prefix = dd._nj_pairs_naive, dd._nj_pairs_prefix

    def naive_spy(*a, **k):
        calls.append("naive")
        return orig_naive(*a, **k)

    def prefix_spy(*a, **k):
        calls.append("prefix")
        return orig_prefix(*a, **k)

    # third case: docs whose BOILERPLATE EXCEEDS the 1−τ prefix
    # fraction (tiny 6-token content under the 13-token footer) — the
    # screen sees a dominant hot head, but the exact confirm must
    # discover the prefixes cannot shed it (every prefix keeps hot
    # shingles) and route to naive anyway
    tiny = [
        (i, " ".join(f"t{i}x{j}" for j in range(6)) + footer)
        for i in range(40)
    ] + [
        (100 + i, " ".join(f"t{i}x{j}" for j in range(5)) + footer)
        for i in range(5)
    ]
    short_boiler = spark.createDataFrame(tiny, "id long, text string")

    dd._nj_pairs_naive, dd._nj_pairs_prefix = naive_spy, prefix_spy
    try:
        for df, want_branch, min_pairs in (
            (rich, "naive", 5),
            (boiler, "prefix", 5),
            (short_boiler, "naive", 1),
        ):
            want = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in dd.ngram_jaccard_pairs(df, "id", "text", 0.5).collect()
            }
            calls.clear()
            got = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in dd.near_dup_edges(df, "id", "text", 0.5).collect()
            }
            assert got == want and len(want) >= min_pairs
            assert calls == [want_branch]
    finally:
        dd._nj_pairs_naive, dd._nj_pairs_prefix = orig_naive, orig_prefix


def test_mmr_grouped_trajectories_valid(spark):
    """sim_mmr_rerank_grouped: every query gets exactly k distinct
    picks from its own shortlist, pick 1 is the pure-relevance argmax,
    and no pick repeats within a query — the per-query greedy contract
    of the single-query operator, held across the whole fleet."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _MMRG_K,
        _MMRG_QUERIES,
    )
    from tests.conftest import SF_SMOKE

    rows = QUERIES["sim_mmr_rerank_grouped"](spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == _MMRG_QUERIES
    for qid, picks in by_q.items():
        assert len(picks) == _MMRG_K
        assert len({p["vec_id"] for p in picks}) == _MMRG_K
        assert qid not in {p["vec_id"] for p in picks}
        first = min(picks, key=lambda p: p["sel_rank"])
        assert first["mmr_score"] == first["relevance"]
        # relevance of pick 1 dominates the shortlist's later picks
        assert all(first["relevance"] >= p["relevance"] for p in picks)


def test_shared_token_spans_maximal_alignment(spark):
    """shared_token_spans (cross-doc ExactSubstr alignment): exactly
    one MAXIMAL span per shared run per diagonal — sub-runs merge,
    positions are 0-based in both docs, unrelated docs emit nothing."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        shared_token_spans,
    )

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x y a b c d e f g h q r"),
        (3, "zz ww vv uu tt ss rr qq"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = shared_token_spans(df, "doc_id", "text", k=5, min_span=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["id_a"],
        r["id_b"],
        r["start_a"],
        r["start_b"],
        r["span_tokens"],
    ) == (1, 2, 0, 2, 8)


def test_remove_shared_spans_cuts_exactly_the_reported_spans(spark):
    """remove_shared_spans (keep-first cross-doc rewrite): the removed
    token positions of every doc are EXACTLY the union of its cut
    ranges from shared_token_spans (id_b side); survivors and
    unrelated docs are untouched; the cleaned hash is the md5 of the
    surviving tokens in order; chained duplicates keep only the
    lowest id's copy."""
    import hashlib

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        remove_shared_spans,
        shared_token_spans,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = [
        (1, f"h1 h2 {shared} t1 t2"),          # lowest id: survivor
        (2, f"b1 b2 b3 {shared} c1 c2"),       # loses the span
        (3, f"{shared} d1 d2 d3 d4 d5"),       # chained: also loses it
        (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),     # unrelated: untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = shared_token_spans(df, "doc_id", "text", k=5, min_span=8).collect()
    out = {r["doc_id"]: r for r in remove_shared_spans(
        df, "doc_id", "text", k=5, min_span=8
    ).collect()}

    # reconciliation: per doc, removed_tokens == |union of its id_b cut
    # ranges reported by the alignment|
    cut_positions: dict[int, set[int]] = {}
    for s in spans:
        cut_positions.setdefault(s["id_b"], set()).update(
            range(s["start_b"], s["start_b"] + s["span_tokens"])
        )
    for did, _text in docs:
        assert out[did]["removed_tokens"] == len(cut_positions.get(did, set()))

    # survivor + unrelated keep everything, with the full-text hash
    for did in (1, 4):
        toks = dict(docs)[did].split()
        assert out[did]["kept_tokens"] == len(toks)
        assert out[did]["cleaned_hash"] == hashlib.md5(
            " ".join(toks).encode()
        ).hexdigest()

    # the cut docs keep exactly their non-shared tokens, in order
    assert out[2]["removed_tokens"] == 10
    assert out[2]["cleaned_hash"] == hashlib.md5(
        b"b1 b2 b3 c1 c2"
    ).hexdigest()
    assert out[3]["removed_tokens"] == 10
    assert out[3]["cleaned_hash"] == hashlib.md5(
        b"d1 d2 d3 d4 d5"
    ).hexdigest()
    # corpus-level yield: one surviving copy of the 10-token span
    assert sum(r["removed_tokens"] for r in out.values()) == 20


def test_remove_contaminated_spans_cuts_exactly_the_benchmark_quote(spark):
    """remove_contaminated_spans (span-level decontamination): a train
    doc quoting a benchmark doc loses EXACTLY the quoted token range
    (island-merged across overlapping k-gram hits); clean train docs
    are untouched with the full-text hash; a train doc repeating the
    quote twice loses both copies; nothing shorter than k matches."""
    import hashlib

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    quote = "q1 q2 q3 q4 q5 q6"  # 6 tokens, k=5 -> two overlapping hits
    bench = spark.createDataFrame(
        [(100, f"e1 e2 {quote} e3 e4")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {quote} b1 b2"),          # one quote, mid-doc
            (2, f"{quote} c1 c2 c3 {quote}"),        # quote twice
            (3, "u1 u2 u3 u4 u5 u6 u7 u8"),          # clean
            (4, "q1 q2 q3 x q4 q5 q6 y z w"),        # broken quote: no 5-gram
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_contaminated_spans(
            train, bench, "doc_id", "text", k=5
        ).collect()
    }

    assert set(out) == {1, 2, 3, 4}
    # doc 1: exactly the 6 quoted tokens go (two k-gram hits merge)
    assert out[1]["removed_tokens"] == 6
    assert out[1]["cleaned_hash"] == hashlib.md5(
        b"a1 a2 a3 b1 b2"
    ).hexdigest()
    # doc 2: both copies cut, the separator survives
    assert out[2]["removed_tokens"] == 12
    assert out[2]["cleaned_hash"] == hashlib.md5(b"c1 c2 c3").hexdigest()
    # clean and sub-k docs untouched
    for did in (3, 4):
        toks = out[did]["n_tokens"]
        assert out[did]["kept_tokens"] == toks
        assert out[did]["removed_tokens"] == 0
    assert out[4]["cleaned_hash"] == hashlib.md5(
        b"q1 q2 q3 x q4 q5 q6 y z w"
    ).hexdigest()


def _py_decontam(train, bench, k):
    """Pure-Python reference for remove_contaminated_spans: removed
    positions = union of [p, p+k-1] over train gram positions whose
    k-gram appears anywhere in the benchmark (island merge at gap <= k
    equals the interval union, adjacency included)."""
    import hashlib

    bkg = set()
    for toks in bench:
        for p in range(len(toks) - k + 1):
            bkg.add(tuple(toks[p : p + k]))
    out = {}
    for did, toks in enumerate(train):
        cut = set()
        for p in range(len(toks) - k + 1):
            if tuple(toks[p : p + k]) in bkg:
                cut.update(range(p, p + k))
        kept = [t for i, t in enumerate(toks) if i not in cut]
        out[did] = (
            len(toks),
            len(kept),
            len(toks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@given(
    train=_span_docs,
    bench=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
        min_size=0,
        max_size=3,
    ),
    k=st.integers(2, 4),
)
@_SET
def test_remove_contaminated_spans_matches_python_reference(
    spark, train, bench, k
):
    """The span-level decontamination rewrite equals the interval-
    union reference on arbitrary tiny-alphabet corpora: every train
    doc accounted for, removed positions exactly the union of
    benchmark-hit gram windows, cleaned hash over the surviving
    tokens in order."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    train_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(train)],
        "doc_id long, text string",
    )
    bench_df = spark.createDataFrame(
        [(1000 + i, " ".join(toks)) for i, toks in enumerate(bench)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["kept_tokens"],
            r["removed_tokens"],
            r["cleaned_hash"],
        )
        for r in remove_contaminated_spans(
            train_df, bench_df, "doc_id", "text", k=k
        ).collect()
    }
    assert got == _py_decontam(train, bench, k)
