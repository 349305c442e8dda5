"""Pigeonhole segment blocking (PassJoin) for edit-distance joins.

The reference links addresses on an EXACT locality code
(``address_etl/pls/tables.py:70``); fuzzy linkage is what an
addressing service needs when that code is dirty.  A coarse blocking
key alone makes candidate generation Sigma(block^2) — quadratic in
data size whenever block cardinality is fixed (8 first-token blocks at
sf0.1 = 25M pairs).  PassJoin (Li, Deng, Feng — "PASS-JOIN: a
partition-based method for similarity joins", VLDB 2012) replaces the
coarse block with a FINE equi-join key derived from a pigeonhole
argument:

  split every string into tau+1 contiguous segments; any string
  within edit distance tau of it must contain at least one of those
  segments as an EXACT substring (tau edits can corrupt at most tau
  of the tau+1 segments), and that substring's start position can
  shift by at most tau from the segment's home position.

Candidate generation therefore becomes an equi-join on
``(block, segment_index, indexed_length, segment_text)`` — output is
proportional to true near-matches, not to block^2, and the join key
is fine enough to parallelize far beyond the block count.  The same
chunk-index trick powers ``dedup_simhash`` for hamming distance.

Two entry points share the machinery: :func:`passjoin_candidates`
(self-join dedup/linkage within one relation) and
:func:`passjoin_link` (A×B record linkage — a dirty feed probed
against a master list, the production address-matching shape).

Everything below is JVM column expressions (sequence/explode/
substring) — no Python UDFs.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Expression-tree memoization (r16 optimization round, guide §7.3 —
# driver-side planning overhead): the Column trees below reference
# input columns BY NAME only and depend on nothing but ``tau`` /
# ``symmetric`` / the caller's column names, yet each construction is
# ~900 py4j round-trips (~0.4 s measured on the probe-rows tree alone —
# every operator/alias/literal is one JVM call). PassJoin is built
# 8-10 times per bench run (three ER-registry folds, the one-shot ER,
# the blocking audit, the geo fuzzy family), so the rebuild cost is
# pure repeated driver work. ``functools.lru_cache`` keyed on those
# scalars makes every build after the first free; Column objects are
# immutable unresolved expression trees bound to the process-wide py4j
# gateway (NOT to a session or a DataFrame), so reuse across frames
# and sessions within one process is exactly how the DSL already
# treats shared module-level Columns. This memoizes EXPRESSIONS only —
# never data, plans-with-stats, or results.
#
# Staleness guard (r16 ADVICE): the cached Columns wrap py4j JavaObject
# refs bound to the gateway alive when they were built. If the JVM
# gateway is torn down and rebuilt inside one Python process (test
# harnesses do this; Spark Connect would too), the cached trees go
# stale and error confusingly. ``_fresh_caches`` compares the live
# gateway against the one recorded at last fill and clears all four
# caches on change — entry points call it, so a gateway restart costs
# one rebuild instead of a stale-JavaObject failure.

_CACHE_GATEWAY_REF: list = [None]


def _fresh_caches() -> None:
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if _CACHE_GATEWAY_REF[0] is not gw:
        for fn in (_prepare_cols, _seg_parts, _probe_parts, _candidate_conds):
            fn.cache_clear()
        _CACHE_GATEWAY_REF[0] = gw


def _seg_len(ls: Column, i: Column, k: int) -> Column:
    """Length of 0-based segment ``i`` when a string of length ``ls``
    is split evenly into ``k`` segments (first ``ls % k`` segments get
    the extra char)."""
    return (ls / k).cast("int") + (i < ls % k).cast("int")


def _seg_start(ls: Column, i: Column, k: int) -> Column:
    """0-based start offset of segment ``i`` under the same even split."""
    return i * (ls / k).cast("int") + F.least(i, ls % k)


@functools.lru_cache(maxsize=None)
def _prepare_cols(
    name_col: str, blk_col: str, seg_col: str | None
) -> tuple[Column, ...]:
    return (
        F.col(blk_col).alias("blk"),
        F.col(name_col).alias("nm"),
        F.col(seg_col if seg_col is not None else name_col).alias("sg"),
        F.length(seg_col if seg_col is not None else name_col).alias("ln"),
    )


def _prepare(names: DataFrame, name_col: str, blk_col: str, seg_col: str | None) -> DataFrame:
    return names.select(*_prepare_cols(name_col, blk_col, seg_col))


@functools.lru_cache(maxsize=None)
def _seg_parts(tau: int) -> tuple[Column, tuple[Column, ...], tuple[Column, ...]]:
    k = tau + 1
    i = F.col("seg_i")
    return (
        F.col("ln") >= k,
        (
            F.col("blk"),
            F.col("nm"),
            F.col("sg"),
            F.col("ln"),
            F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("seg_i"),
        ),
        (
            F.col("blk"),
            F.col("nm").alias("nm_s"),
            F.col("ln").alias("ls"),
            F.col("seg_i"),
            F.substring(
                F.col("sg"),
                (_seg_start(F.col("ln"), i, k) + 1).cast("int"),
                _seg_len(F.col("ln"), i, k).cast("int"),
            ).alias("piece"),
        ),
    )


def _seg_rows(base: DataFrame, tau: int) -> DataFrame:
    """Index side: the tau+1 segments of every string of length >= k
    (shorter strings have EMPTY segments — vacuous matches — and are
    the caller's fallback leg)."""
    long_enough, exploded, final = _seg_parts(tau)
    return base.filter(long_enough).select(*exploded).select(*final)


def _probe_rows(base: DataFrame, tau: int, symmetric: bool) -> DataFrame:
    """Probe side: for each candidate indexed-string length ls_cand,
    every substring of the probe that some segment of an ls_cand-long
    string could match.

    ``symmetric`` (self-join): ls_cand in [ln - tau, ln] — only the
    shorter-or-equal string is indexed; distance is symmetric so each
    pair is still generated once, and probes shorter than k pair only
    via the fallback (sharper: Spark's sequence(a, b) with a > b
    silently yields a DESCENDING range, so the ln < k case would emit
    junk ls_cand values above ln instead of nothing).

    A×B link: ls_cand in [ln - tau, ln + tau] — the indexed side is
    FIXED (the master list), so both length directions probe; any
    probe of length >= 1 can host a segment of a longer indexed
    string.

    EMPTY probes (ln == 0 — real under ``seg_col`` when a name is the
    bare block token) generate no rows in EITHER leg, and completeness
    still holds by a length argument the fallback leg depends on: any
    indexed string within tau of the empty string has length
    <= tau < k, so it is short-indexed and the caller's fallback
    pairs it with every same-block probe in the +-tau length window —
    including the empty probe. Changing the fallback's ``ln < k``
    length filter breaks this; the invariant is pinned by the
    empty-string case of the exhaustive mirror test and an
    empty-rest link test (tests/test_fuzzy_passjoin.py).
    """
    (
        src_filter,
        sel_seg,
        sel_len,
        sel_geom,
        lo_col,
        hi_col,
        window_nonempty,
        sel_pos,
        sel_final,
    ) = _probe_parts(tau, symmetric)
    return (
        base.filter(src_filter)
        .select(*sel_seg)
        .select(*sel_len)
        .select(*sel_geom)
        # Multi-match-aware position window (PassJoin §4.2): segment i
        # of the indexed string can only match the probe at
        # [max(0, p_i - i, p_i + Δ - (tau - i)),
        #  min(lt - l_i, p_i + i, p_i + Δ + (tau - i))] — completeness
        # holds COLLECTIVELY (if no segment matches inside its window
        # the edit total provably exceeds tau), cutting fan-out ~2x vs
        # the loose ±tau window. Property-tested end to end in
        # tests/test_fuzzy_passjoin.py (random-edit no-loss sweeps).
        .withColumn("lo", lo_col)
        .withColumn("hi", hi_col)
        .filter(window_nonempty)
        .select(*sel_pos)
        .select(*sel_final)
    )


@functools.lru_cache(maxsize=None)
def _probe_parts(tau: int, symmetric: bool) -> tuple:
    k = tau + 1
    i = F.col("seg_i")
    lsc = F.col("ls_cand")
    if symmetric:
        src_filter = F.col("ln") >= k
        ls_hi = F.col("ln")
    else:
        # greatest(ln - tau, k) <= ln + tau  <=>  ln >= k - tau = 1
        src_filter = F.col("ln") >= 1
        ls_hi = F.col("ln") + tau
    base_cols = (F.col("blk"), F.col("nm"), F.col("sg"), F.col("ln"))
    sel_seg = base_cols + (
        F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("seg_i"),
    )
    sel_len = base_cols + (
        F.col("seg_i"),
        F.explode(
            F.sequence(F.greatest(F.col("ln") - tau, F.lit(k)), ls_hi)
        ).alias("ls_cand"),
    )
    sel_geom = base_cols + (
        F.col("seg_i"),
        F.col("ls_cand"),
        _seg_len(lsc, i, k).cast("int").alias("plen"),
        _seg_start(lsc, i, k).cast("int").alias("pstart"),
        (F.col("ln") - lsc).cast("int").alias("delta"),
    )
    lo_col = F.greatest(
        F.lit(0),
        F.col("pstart") - i,
        F.col("pstart") + F.col("delta") - (F.lit(tau) - i),
    )
    hi_col = F.least(
        F.col("ln") - F.col("plen"),
        F.col("pstart") + i,
        F.col("pstart") + F.col("delta") + (F.lit(tau) - i),
    )
    window_nonempty = F.col("lo") <= F.col("hi")
    sel_pos = base_cols + (
        F.col("seg_i"),
        F.col("ls_cand"),
        F.col("plen"),
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("pos"),
    )
    sel_final = (
        F.col("blk").alias("blk_p"),
        F.col("nm").alias("nm_p"),
        F.col("seg_i").alias("seg_i_p"),
        F.col("ls_cand"),
        F.substring(F.col("sg"), F.col("pos") + 1, F.col("plen")).alias("piece_p"),
    )
    return (
        src_filter,
        sel_seg,
        sel_len,
        sel_geom,
        lo_col,
        hi_col,
        window_nonempty,
        sel_pos,
        sel_final,
    )


#: Join keys shared by both entry points. Distinct column names on
#: each side: the frames can share lineage, and same-named self-join
#: keys can resolve to the same attribute (a trivially-true predicate
#: that silently drops the block constraint).
@functools.lru_cache(maxsize=None)
def _candidate_conds() -> tuple[Column, ...]:
    return (
        F.col("blk") == F.col("blk_p"),
        F.col("seg_i") == F.col("seg_i_p"),
        F.col("ls") == F.col("ls_cand"),
        F.col("piece") == F.col("piece_p"),
    )


def _candidate_join(segs: DataFrame, probes: DataFrame, extra) -> DataFrame:
    conds = list(_candidate_conds())
    if extra is not None:
        conds.append(extra)
    return segs.join(probes, on=conds)


def passjoin_candidates(
    names: DataFrame,
    name_col: str,
    blk_col: str,
    tau: int,
    seg_col: str | None = None,
) -> DataFrame:
    """Candidate name pairs for an edit-distance-``tau`` self-join.

    ``names`` must be DISTINCT on (blk, name) — dedup the value space
    before candidate generation so repeated values cost once, not
    count^2 (row-level expansion is the caller's equi-join back on the
    name).  Returns ``(blk, name_a, name_b)`` with ``name_a < name_b``,
    a SUPERSET of all same-block pairs with edit distance <= tau
    (verification — the actual levenshtein — is the caller's job).

    Probe fan-out is bounded by ``(tau+1)^2 * (2*tau+1)`` rows per
    string — constant, not data-dependent.

    Strings shorter than ``tau + 1`` have empty segments, and an
    untouched EMPTY segment matches vacuously — the equi-join would
    lose those pairs, so they fall back to an all-pairs leg within the
    block (bounded: at most ``26^tau``-ish distinct strings exist that
    short).

    ``seg_col``: optional column to SEGMENT AND PROBE instead of the
    name itself — output pairs still carry ``name_col`` values.  Use
    it when every name in a block shares a known prefix (the usual
    case when the block IS the first token): segment 0 of the full
    name then degenerates to that prefix, a near-zero-entropy join
    key whose candidate count reverts to ~block² (measured: 107s vs
    3s naive at 10k distinct names before this dial existed).  Equal
    leading characters never change Levenshtein distance (strip-
    common-prefix identity), so segmenting the post-prefix remainder
    is distance-preserving and completeness survives: ed(full) <= tau
    ⇒ ed(rest) <= tau ⇒ some rest-segment matches exactly.  The
    caller owns that the stripped prefix really is common to the
    block.
    """
    k = tau + 1
    _fresh_caches()
    base = _prepare(names, name_col, blk_col, seg_col)
    main = _candidate_join(
        _seg_rows(base, tau),
        _probe_rows(base, tau, symmetric=True),
        F.col("nm_s") != F.col("nm_p"),
    ).select(
        "blk",
        F.least("nm_s", "nm_p").alias("name_a"),
        F.greatest("nm_s", "nm_p").alias("name_b"),
    )

    # Short-string fallback: all pairs within the block where at least
    # one side is shorter than k chars and lengths are within tau.
    short = base.filter(F.col("ln") < k).select(
        F.col("blk").alias("blk_s"),
        F.col("nm").alias("nm_short"),
        F.col("ln").alias("ln_s"),
    )
    fallback = short.join(
        base,
        on=[
            F.col("blk_s") == F.col("blk"),
            F.col("nm_short") != F.col("nm"),
            F.abs(F.col("ln_s") - F.col("ln")) <= tau,
        ],
    ).select(
        "blk",
        F.least("nm_short", "nm").alias("name_a"),
        F.greatest("nm_short", "nm").alias("name_b"),
    )

    return main.unionByName(fallback).distinct()


def passjoin_link(
    a_names: DataFrame,
    b_names: DataFrame,
    name_col: str,
    blk_col: str,
    tau: int,
    seg_col: str | None = None,
) -> DataFrame:
    """Candidate pairs for an edit-distance-``tau`` A×B record
    linkage: ``name_a`` from ``a_names`` (the INDEXED master list),
    ``name_b`` from ``b_names`` (the probed feed). Both inputs must be
    DISTINCT on (blk, name) with the same column names. Returns
    ``(blk, name_a, name_b)``, a superset of all same-block cross
    pairs with edit distance <= tau — INCLUDING exact matches
    (distance 0), which a linkage keeps rather than excludes.

    Differences from the self-join: the indexed side is fixed, so the
    probe enumerates candidate indexed lengths on BOTH sides of its
    own length ([ln - tau, ln + tau]); equal names are kept; and only
    A-side short strings need the fallback leg (a short PROBE can
    still host a segment of a longer indexed string, but a short
    INDEXED string has vacuously-matching empty segments).
    """
    k = tau + 1
    _fresh_caches()
    a = _prepare(a_names, name_col, blk_col, seg_col)
    b = _prepare(b_names, name_col, blk_col, seg_col)
    main = _candidate_join(
        _seg_rows(a, tau), _probe_rows(b, tau, symmetric=False), None
    ).select("blk", F.col("nm_s").alias("name_a"), F.col("nm_p").alias("name_b"))

    short_a = a.filter(F.col("ln") < k).select(
        F.col("blk").alias("blk_s"),
        F.col("nm").alias("nm_short"),
        F.col("ln").alias("ln_s"),
    )
    fallback = short_a.join(
        b,
        on=[
            F.col("blk_s") == F.col("blk"),
            F.abs(F.col("ln_s") - F.col("ln")) <= tau,
        ],
    ).select(
        "blk",
        F.col("nm_short").alias("name_a"),
        F.col("nm").alias("name_b"),
    )

    return main.unionByName(fallback).distinct()
