"""PassJoin candidate generation (operators/fuzzy.py).

The completeness contract is the whole point: for every same-block
pair within edit distance tau, the (seg_idx, indexed_length,
substring) equi-join must produce the pair as a candidate — losing
one is silent wrong answers, not slowness. These tests pin that with
an adversarial randomized sweep (seeded — hypothesis-style volume,
one Spark job) plus the structural edges: short strings (empty
segments fall back to all-pairs), block separation, and the
canonical (name_a < name_b) output shape.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
    passjoin_candidates,
)

TAU = 3
_ALPHA = "abcdefgh"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def _random_edits(rng: random.Random, s: str, n_edits: int) -> str:
    out = s
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del")) if out else "ins"
        pos = rng.randrange(len(out) + (op == "ins"))
        ch = rng.choice(_ALPHA)
        if op == "sub":
            out = out[:pos] + ch + out[pos + 1 :]
        elif op == "ins":
            out = out[:pos] + ch + out[pos:]
        elif len(out) > 1:
            out = out[:pos] + out[pos + 1 :]
    return out


def _candidates(spark, rows):
    df = spark.createDataFrame(rows, "blk string, nm string").distinct()
    return {
        (r["blk"], r["name_a"], r["name_b"])
        for r in passjoin_candidates(df, "nm", "blk", TAU).collect()
    }


def test_no_candidate_loss_random_edit_sweep(spark):
    """400 randomly edited variants (0-3 edits each, lengths 4-40)
    of 40 base strings: every pair within distance <= TAU must
    survive candidate generation. The false-positive direction needs
    no test — verification re-checks levenshtein — but completeness
    has no second chance."""
    rng = random.Random(0xF022)
    rows = []
    for b in range(40):
        base = "".join(rng.choice(_ALPHA) for _ in range(rng.randint(4, 40)))
        rows.append(("blk0", base))
        for _ in range(10):
            rows.append(("blk0", _random_edits(rng, base, rng.randint(0, TAU))))
    got = _candidates(spark, rows)
    names = sorted({nm for _, nm in rows})
    required = {
        ("blk0", a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= TAU
    }
    missing = required - got
    assert not missing, f"{len(missing)} lost pairs, e.g. {sorted(missing)[:5]}"


def test_no_candidate_loss_with_prefix_stripped_seg_col(spark):
    """The seg_col dial (segment the post-block remainder because the
    block is a shared name prefix) must stay complete: distance is
    prefix-strip invariant, so every full-name pair within TAU still
    has to surface. Same sweep as above but names carry the block as
    their first token, and segmentation runs on the remainder."""
    rng = random.Random(0xF023)
    rows = []
    for b in range(30):
        blk = rng.choice(("red", "blue", "small"))
        base = "".join(rng.choice(_ALPHA) for _ in range(rng.randint(4, 30)))
        rows.append((blk, f"{blk} {base}"))
        for _ in range(8):
            rows.append(
                (blk, f"{blk} {_random_edits(rng, base, rng.randint(0, TAU))}")
            )
    df = (
        spark.createDataFrame(rows, "blk string, nm string")
        .distinct()
        .withColumn("rest", F.expr("substring(nm, length(blk) + 2)"))
    )
    got = {
        (r["blk"], r["name_a"], r["name_b"])
        for r in passjoin_candidates(df, "nm", "blk", TAU, seg_col="rest").collect()
    }
    by_blk: dict[str, list[str]] = {}
    for blk, nm in set(rows):
        by_blk.setdefault(blk, []).append(nm)
    required = {
        (blk, a, b)
        for blk, nms in by_blk.items()
        for i, a in enumerate(sorted(nms))
        for b in sorted(nms)[i + 1 :]
        if _lev(a, b) <= TAU
    }
    missing = required - got
    assert not missing, f"{len(missing)} lost pairs, e.g. {sorted(missing)[:5]}"


def test_short_strings_fall_back_to_all_pairs(spark):
    """Strings shorter than tau+1 have EMPTY segments — the pigeonhole
    match is vacuous there, so they must reach candidates via the
    all-pairs leg instead of being silently dropped."""
    rows = [("b", "ab"), ("b", "ax"), ("b", "abcde"), ("b", "x")]
    got = _candidates(spark, rows)
    for a, b in [("ab", "ax"), ("ab", "abcde"), ("ab", "x"), ("ax", "x")]:
        if _lev(a, b) <= TAU:
            assert ("b", min(a, b), max(a, b)) in got, (a, b)


def test_blocks_are_respected(spark):
    """Identical near-dup names in DIFFERENT blocks must not pair —
    the blk key is part of the join, not a post-filter."""
    rows = [("b1", "hello"), ("b2", "hellx"), ("b1", "hellp")]
    got = _candidates(spark, rows)
    assert ("b1", "hello", "hellp") in got
    assert all(not (a == "hello" and b == "hellx") for _, a, b in got)


def test_output_is_canonical_and_distinct(spark):
    rows = [("b", "kitten"), ("b", "sitten"), ("b", "sittin")]
    df = spark.createDataFrame(rows, "blk string, nm string")
    out = passjoin_candidates(df, "nm", "blk", TAU)
    rows_out = out.collect()
    assert len(rows_out) == len(set(map(tuple, rows_out)))
    assert all(r["name_a"] < r["name_b"] for r in rows_out)


def test_fuzzy_query_matches_naive_block_join(spark):
    """End-to-end: the rewritten geo_fuzzy_match_blocked equals the
    naive Sigma block^2 plan row-for-row on the smoke data (the same
    semantics the DuckDB oracle pins at parity time)."""
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from tests.conftest import SF_SMOKE

    got = {
        tuple(r)
        for r in QUERIES["geo_fuzzy_match_blocked"](spark, SF_SMOKE).collect()
    }
    p = load(spark, SF_SMOKE, "part").select(
        "p_partkey", "p_name", F.split(F.col("p_name"), " ")[0].alias("blk")
    )
    a = p.select("blk", F.col("p_partkey").alias("lk"), F.col("p_name").alias("ln"))
    b = p.select("blk", F.col("p_partkey").alias("rk"), F.col("p_name").alias("rn"))
    naive = {
        tuple(r)
        for r in a.join(b, "blk")
        .filter(F.col("lk") < F.col("rk"))
        .select("lk", "rk", F.levenshtein("ln", "rn").cast("int").alias("d"))
        .filter(F.col("d").between(1, TAU))
        .collect()
    }
    assert got == naive


def test_link_no_candidate_loss_cross_tables(spark):
    """A×B linkage completeness: masters are random strings, the feed
    is randomly edited variants (0-TAU edits, so exact matches appear
    too); every cross pair within TAU — including distance 0 — must
    survive candidate generation, in both length directions (feed
    shorter AND longer than master)."""
    from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
        passjoin_link,
    )

    rng = random.Random(0xF024)
    masters, feed = [], []
    for _ in range(30):
        base = "".join(rng.choice(_ALPHA) for _ in range(rng.randint(2, 30)))
        masters.append(("blk0", base))
        for _ in range(8):
            feed.append(("blk0", _random_edits(rng, base, rng.randint(0, TAU))))
    a = spark.createDataFrame(masters, "blk string, nm string").distinct()
    b = spark.createDataFrame(feed, "blk string, nm string").distinct()
    got = {
        (r["name_a"], r["name_b"])
        for r in passjoin_link(a, b, "nm", "blk", TAU).collect()
    }
    required = {
        (ma, fb)
        for _, ma in set(masters)
        for _, fb in set(feed)
        if _lev(ma, fb) <= TAU
    }
    missing = required - got
    assert missing == set(), f"{len(missing)} lost pairs, e.g. {sorted(missing)[:5]}"
    # directionality: name_a values are master names only
    master_set = {m for _, m in masters}
    assert all(na in master_set for na, _ in got)


def test_link_feed_query_links_intact_block_records(spark):
    """Every feed record whose FIRST TOKEN survived corruption must
    link to its own master at distance <= 1 (self-match: one char
    overwritten), with master_key <= feed_key only when a smaller
    master shares the best name — cross-checked against a naive
    in-Python linkage on the smoke fixture."""
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from tests.conftest import SF_SMOKE

    got = {
        r["feed_key"]: (r["master_key"], r["edit_dist"])
        for r in QUERIES["geo_fuzzy_link_feed"](spark, SF_SMOKE).collect()
    }
    parts = {
        r["p_partkey"]: r["p_name"]
        for r in load(spark, SF_SMOKE, "part").collect()
    }

    def feed_name(k, name):
        p = k % len(name)
        return name[:p] + "z" + name[p + 1 :]

    by_blk: dict[str, list[tuple[int, str]]] = {}
    for k, n in parts.items():
        by_blk.setdefault(n.split(" ")[0], []).append((k, n))
    for k, n in parts.items():
        fn = feed_name(k, n)
        cands = [
            (d, mk)
            for mk, mn in by_blk.get(fn.split(" ")[0], [])
            if (d := _lev(fn, mn)) <= 2
        ]
        expect = min(cands) if cands else None
        actual = got.get(k)
        if expect is None:
            assert actual is None, (k, fn, actual)
        else:
            assert actual == (expect[1], expect[0]), (k, fn, actual, expect)


# ---------------------------------------------------------------------------
# Pure-Python exhaustive mirror of the window formula (no Spark) —
# pins the collective-completeness guarantee itself, not just sampled
# corpora: every binary-alphabet pair within tau must be generated.
# ---------------------------------------------------------------------------


def _mirror_seg(ls, i, k):
    return ls // k + (1 if i < ls % k else 0), i * (ls // k) + min(i, ls % k)


def _mirror_is_candidate(s: str, t: str, tau: int, symmetric: bool) -> bool:
    """Mirror of _seg_rows + _probe_rows + _candidate_join for one
    (indexed s, probe t) direction."""
    k = tau + 1
    ls, lt = len(s), len(t)
    if ls < k:
        return True  # fallback leg admits every length-window pair
    lo_ls = max(lt - tau, k)
    hi_ls = lt if symmetric else lt + tau
    if not (lo_ls <= ls <= hi_ls) or lt < 1:
        return False
    delta = lt - ls
    for i in range(k):
        li, pstart = _mirror_seg(ls, i, k)
        lo = max(0, pstart - i, pstart + delta - (tau - i))
        hi = min(lt - li, pstart + i, pstart + delta + (tau - i))
        for pos in range(lo, hi + 1):
            if t[pos : pos + li] == s[pstart : pstart + li]:
                return True
    return False


def test_window_formula_exhaustive_binary_alphabet():
    """Exhaustive: ALL binary strings up to length 7, every tau in
    1..3: ed(s, t) <= tau must imply candidate generation. Self-join
    direction: the shorter (or equal, either order) string indexed;
    link direction: s indexed regardless of which side is longer."""
    from itertools import product

    # n starts at 0: the EMPTY string is a real probe under seg_col
    # (a name that is the bare block token) and pins the invariant
    # that anything within tau of "" is short enough for the fallback.
    strings = [
        "".join(bits)
        for n in range(0, 8)
        for bits in product("ab", repeat=n)
    ]
    for tau in (1, 2, 3):
        for s in strings:
            for t in strings:
                if _lev(s, t) > tau:
                    continue
                # link: s always the indexed side
                assert _mirror_is_candidate(s, t, tau, symmetric=False), (
                    "link", tau, s, t)
                # self-join: generated with the shorter side indexed
                short, lng = (s, t) if (len(s), s) <= (len(t), t) else (t, s)
                assert _mirror_is_candidate(short, lng, tau, symmetric=True), (
                    "self", tau, s, t)


def test_link_empty_rest_probe_pairs_via_fallback(spark):
    """A feed name that is the BARE block token has an empty post-
    prefix rest under seg_col: the main leg generates no probe rows
    for it (ln >= 1 filter), so every master within tau must arrive
    via the short-A fallback. Any rest within tau of "" has length
    <= tau < k — the invariant the fallback's `ln < k` filter relies
    on (see _probe_rows docstring); this pins it at the Spark level."""
    from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
        passjoin_link,
    )

    masters = [
        ("red", "red a"),  # rest "a"      lev 1
        ("red", "red ab"),  # rest "ab"     lev 2
        ("red", "red abc"),  # rest "abc"    lev 3 == TAU
        ("red", "red abcd"),  # rest "abcd"   lev 4  > TAU
        ("red", "red abcdefgh"),  # long rest — segment-indexed side
    ]
    feed = [("red", "red"), ("red", "red ab")]  # bare token + a normal probe
    prep = lambda rows: (
        spark.createDataFrame(rows, "blk string, nm string")
        .distinct()
        .withColumn("rest", F.expr("substring(nm, length(blk) + 2)"))
    )
    got = {
        (r["name_a"], r["name_b"])
        for r in passjoin_link(
            prep(masters), prep(feed), "nm", "blk", TAU, seg_col="rest"
        ).collect()
    }
    rest = lambda nm: nm[4:]
    required = {
        (ma, fb)
        for _, ma in masters
        for _, fb in feed
        if _lev(rest(ma), rest(fb)) <= TAU
    }
    assert ("red a", "red") in required  # the empty-rest probe really pairs
    missing = required - got
    assert missing == set(), f"lost pairs: {sorted(missing)}"


# ---------------------------------------------------------------------------
# Multi-pass blocking recall (geo_fuzzy_link_feed_multiblock)
# ---------------------------------------------------------------------------


def test_multiblock_recovers_first_token_corruption(spark):
    """The recall contract of the union-of-blocks pass: a corruption
    in the FIRST token breaks the first-token block (single-pass miss)
    but leaves the last token intact, so the two-pass union links the
    record; a corruption that eats the only SEPARATOR breaks both
    token keys at once and stays unmatched under either (the honest
    residue the docstring documents)."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        link_feed_to_masters,
    )

    masters = [(1, "alpha bravo"), (2, "charlie delta"), (3, "echo fox")]
    feed = [
        (10, "zlpha bravo"),    # first-token hit  -> pass 2 only
        (11, "charlie deltz"),  # last-token hit   -> pass 1 only
        (12, "echozfox"),       # separator hit    -> neither pass
    ]
    m = spark.createDataFrame(masters, "mk bigint, mn string")
    f = spark.createDataFrame(feed, "fk bigint, fn string")

    def links(block_keys):
        return {
            r["feed_key"]: (r["master_key"], r["edit_dist"])
            for r in link_feed_to_masters(
                m, f, 2, block_keys=block_keys
            ).collect()
        }

    single = links(("first_token",))
    assert single == {11: (2, 1)}  # first-token corruption unrecoverable
    both = links(("first_token", "last_token"))
    assert both == {10: (1, 1), 11: (2, 1)}  # separator residue stays out
    # last-token-only pass is the mirror image — sanity of _block_names
    assert links(("last_token",)) == {10: (1, 1)}


def test_block_names_strategies(spark):
    """_block_names rest-trimming edges: single-token names get an
    empty rest under BOTH strategies (nothing beyond the block), and
    an unknown strategy raises."""
    import pytest

    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _block_names,
    )

    names = spark.createDataFrame(
        [("solo",), ("two tokens",), ("a b c",)], "nm string"
    )
    first = {
        r["nm"]: (r["blk"], r["rest"])
        for r in _block_names(names, "first_token").collect()
    }
    assert first == {
        "solo": ("solo", ""),
        "two tokens": ("two", "tokens"),
        "a b c": ("a", "b c"),
    }
    last = {
        r["nm"]: (r["blk"], r["rest"])
        for r in _block_names(names, "last_token").collect()
    }
    assert last == {
        "solo": ("solo", ""),
        "two tokens": ("tokens", "two"),
        "a b c": ("c", "a b"),
    }
    whole = {
        r["nm"]: (r["blk"], r["rest"])
        for r in _block_names(names, "whole_name").collect()
    }
    assert whole == {
        "solo": ("*", "solo"),
        "two tokens": ("*", "two tokens"),
        "a b c": ("*", "a b c"),
    }
    with pytest.raises(ValueError, match="unknown block strategy"):
        _block_names(names, "soundex")
