"""Incremental corpus-dedup registry — the ``er_resolve_increment``
discipline (``workload/geo.py``) applied to fuzzy TEXT dedup: the
production shape for continuous ingest, where the corpus keep-list
accretes batch by batch and the near-dup clustering is NEVER re-run
from zero (r12 verdict #3).

Standing state, two tables:

- the REGISTRY: one row per ingested document —
  ``(doc_id, n_tokens, n_sh, label, canonical_id, kept)`` where
  ``label`` is the near-dup component's minimum doc_id,
  ``canonical_id`` the component's keep-longest survivor
  (n_tokens DESC, doc_id ASC — ``dedup_cluster_canonical``'s policy)
  and ``kept`` the keep-list flag a downstream writer filters on;
- the POSTINGS index: ``(doc_id, sh)`` — the md5 of each distinct
  token-shingle of each ingested document (the inverted-index side
  every future batch probes; md5 keys keep the exchange narrow, the
  ``duplicated_token_spans`` discipline — at 100 TB swap xxhash64).

Folding one batch of new documents:

1. docs already registered are dropped (re-ingest is identity);
2. the batch's postings probe the ACCUMULATED index (new×old) and the
   batch's own postings (new×new) — through a MEASURED GATE between
   the naive count-join probe and ONE-SIDED prefix filtering (both
   exact, see below); in the boilerplate regime the gate picks the
   prefix probe, so candidate work is ∝ the batch's RARE-shingle
   posting collisions, never corpus² and never hot-shingle df²;
3. candidates verify with EXACT Jaccard (intersection counts from a
   candidate-restricted postings join; set sizes from the registry
   for old docs) — the same round-to-6 ≥ threshold rule as
   ``ngram_jaccard_pairs``, so the emitted edge set is IDENTICAL to
   a naive full-postings probe's;
4. verified edges lift to the LABEL level and a bounded star-CC
   re-label merges touched components only (the mini-graph is ∝ batch
   edges — ``er_resolve_increment`` step 3);
5. ``kept``/``canonical_id`` recompute ONLY for touched components
   (new members, merges, or re-labels); untouched rows carry their
   stored flags forward — which is what lets the partitioned
   versioned state (``streaming/versioned.py``) skip their buckets.

ONE-SIDED prefix filtering (the r13-verdict fix, composed so the
boilerplate regime stays bounded): the index stores FULL postings
(they also feed the exact verify), but each fold probes with only
each batch doc's first ``|sh| − ⌈τ·|sh|⌉ + 1`` shingles in ascending
ACCUMULATED-document-frequency order (ties by shingle hash). Why this
is complete with no order shared across batches at all: J(A,B) ≥ τ
implies |A∩B| ≥ τ·|A| (the union is at least |B| ≥ |A∩B|, so
|A∩B|·(1+τ) ≥ τ·(|A|+|A∩B|)); if none of the probed shingles of A
were in B, the intersection would fit inside A's unprobed
⌈τ·|A|⌉ − 1 shingles — a contradiction. The pigeonhole needs only
A's OWN probe subset, not a global order both endpoints agree on —
any (|A| − ⌈τ·|A|⌉ + 1)-subset of A's shingles works — so each fold
may rank under its own df snapshot and the every-true-edge-found-in-
its-completing-batch argument (below) carries over unchanged. Ranking
by CURRENT df is what makes the boilerplate regime flat: a corpus-hot
shingle (df ≈ |corpus|) sorts last within every batch doc and falls
out of every probe, where the two-sided fixed-hash-order alternative
(rank by ``xxhash64(shingle)``, stable across batches) keeps ~(1−τ)
of the hot shingles inside prefixes — a constant-factor reduction,
still superlinear where its own growth probe blows up
(``scripts/dedup_registry_growth.py`` measures both claims). The df
snapshot is one partial-aggregatable groupBy over the index the fold
already scans; at 100 TB df is ADDITIVE (df' = df + df_batch), so a
deployment keeps it as a small side state instead of re-aggregating.

The GATE (shared economics with ``operators/dedup.py
near_dup_edges``): prefix filtering only pays when the corpus has a
rare tail for hot shingles to fall behind. On an all-hot corpus (the
driver's fixed-31-word-vocab synthetic; or documents whose boilerplate
exceeds the 1−τ prefix fraction) the prefix still probes hot-ish
shingles AND pays a per-candidate intersection recount the naive
count-join gets for free — measured 4–8× slower for the identical
edge set. Both probe volumes are exact one-scalar reads off the
df-ranked batch postings (Σ df over all vs over prefix rows), so each
fold picks the cheaper exact plan; mixing strategies across folds is
immaterial to the reconciliation argument because every fold emits
the same verified edge set either way.

A cluster MERGE can DEMOTE a previously-kept document (its component
gains a longer member) — the case a one-shot never sees; pinned in
``tests/test_dedup_registry.py``.

Order-independence (the reconcile-exactly argument, as for ER): every
true edge is discovered in the batch that completes its pair — the
later endpoint probes an index already holding the earlier one — and
connectivity is order-independent, so after any batching the labels
equal the converged one-shot's; canonical selection is a pure function
of (membership, n_tokens), so the keep-list reconciles too. The
registered query's oracle is the converged one-shot (recursive
reachability CTE + the canonical window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..runtime import materialize
from .dedup import connected_components_star, shingles_col, tokens_col

DEDUP_REGISTRY_SCHEMA = (
    "doc_id bigint, n_tokens bigint, n_sh bigint, label bigint, "
    "canonical_id bigint, kept boolean"
)
DEDUP_POSTINGS_SCHEMA = "doc_id bigint, sh string"


def empty_dedup_registry(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], DEDUP_REGISTRY_SCHEMA)


def empty_dedup_postings(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], DEDUP_POSTINGS_SCHEMA)


def dedup_fold_increment(
    registry: DataFrame,
    postings: DataFrame,
    batch: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Fold one batch of ``(doc_id, text)`` documents into the standing
    registry + postings index; returns ``(new_registry,
    new_postings)``. See the module docstring for the algorithm and
    the order-independence argument.

    Scale: candidate generation joins the BATCH's PREFIX postings
    (rarest ``(1−τ)·|sh|+1`` shingles under the fold's accumulated-df
    order — one-sided PPJoin, module docstring) against the index, so
    shuffle is ∝ the batch's rare-shingle collisions even when the
    corpus carries hot boilerplate shingles; the re-label mini-graph
    is ∝ batch edges; the kept/canonical window partitions by touched
    component only. The full postings index is scanned per fold (df
    snapshot + probe + verify — df is additive at deployment scale,
    see module docstring); the write side is the partitioned
    versioned layout's job (touched buckets only)."""
    spark = batch.sparkSession

    # --- new documents only (re-ingest is identity) -------------------
    new_docs = (
        batch.dropDuplicates([id_col])
        .join(registry.select(id_col), id_col, "left_anti")
        .select(id_col, text_col)
    )
    toks = new_docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).transform(materialize)
    # batch postings, shingles md5-keyed; feeds the cross probe, the
    # self join, the size aggregate and the postings output. Built
    # from the ALREADY-materialized token arrays — shingle_postings
    # would re-tokenize the batch a second time for the same frame
    bp = toks.select(
        F.col(id_col),
        F.explode(shingles_col(F.col("_toks"), shingle_n)).alias("shingle"),
    ).select(F.col(id_col), F.md5(F.col("shingle")).alias("sh")).transform(
        materialize
    )
    bsizes = bp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    new_rows = (
        toks.select(
            F.col(id_col), F.size("_toks").cast("long").alias("n_tokens")
        )
        .join(bsizes, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_sh"), F.lit(0)).cast("long").alias("n_sh"),
        )
        .transform(materialize)
    )

    # --- candidate pairs incident to a new doc -------------------------
    # rank each batch doc's shingles by ascending df over the
    # ACCUMULATED index ∪ the batch (a shingle going hot inside this
    # very batch must count too) — the rank feeds the one-sided PPJoin
    # prefix probe AND the measured gate that decides whether that
    # probe is worth its extra stages (module docstring; the
    # near_dup_edges economics, fold-local)
    dfreq = (
        postings.unionByName(bp)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .transform(materialize)
    )
    # the gate, two-stage (near_dup_edges' economics, fold-local, with
    # the naive path paying only the df aggregate it shares): first a
    # df-profile SCREEN over dfreq alone — does a hot head
    # (df ≥ max(20×mean, 10)) carry the majority of Σ df·(df−1)
    # collision volume? An all-hot corpus (the driver's fixed-31-word-
    # vocab synthetic — no rare tail) routes straight to naive and
    # never builds the rank window. Only when a hot head dominates is
    # the batch ranked, and the exact confirm (Σ df over PREFIX
    # postings vs over ALL batch postings, the respective probe-output
    # bounds) must show a 4× win — this catches docs whose boilerplate
    # exceeds the 1−τ prefix fraction, where prefixes must keep hot
    # shingles and prefix would pay its recount for nothing. Each
    # stage is one bounded scalar action (the dedup.py convergence-
    # check pattern). In the boilerplate regime the gate picks prefix,
    # which is what keeps the fold FLAT where the naive probe grows
    # ∝ corpus per fold (scripts/dedup_registry_growth.py).
    dfd = F.col("_df").cast("double")
    tot = dfreq.agg(F.sum("_df").alias("p"), F.count(F.lit(1)).alias("s"))
    scr = (
        dfreq.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(dfd * (dfd - 1)).alias("coll"),
            F.sum(
                F.when(
                    dfd
                    >= F.greatest(
                        F.lit(10.0), F.lit(20.0) * F.col("p") / F.col("s")
                    ),
                    dfd * (dfd - 1),
                )
            ).alias("hot"),
        )
        .collect()[0]
    )
    use_prefix = False
    ranked = None
    if scr["coll"] is not None:
        if scr["hot"] is not None and scr["hot"] * 2.0 >= scr["coll"]:
            wrank = Window.partitionBy(id_col).orderBy("_df", "sh")
            wsz = Window.partitionBy(id_col)
            plen = F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1
            ranked = (
                bp.join(dfreq, "sh")
                .select(
                    id_col,
                    "sh",
                    F.row_number().over(wrank).alias("_rn"),
                    F.count(F.lit(1)).over(wsz).alias("_sz"),
                    "_df",
                )
                .transform(materialize)
            )
            st = ranked.agg(
                F.sum("_df").alias("full"),
                F.sum(F.when(F.col("_rn") <= plen, F.col("_df"))).alias("pre"),
            ).collect()[0]
            use_prefix = (
                st["pre"] is not None and st["pre"] * 4.0 <= st["full"]
            )
    sizes = registry.select(F.col(id_col), "n_sh").unionByName(
        new_rows.select(id_col, "n_sh")
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("sz_b"))
    if use_prefix:
        # ONE prefix probe against old ∪ batch postings covers new×old
        # and new×new; pairs canonicalize to (min,max) — the edge set
        # feeds symmetric CC, and the distinct dedupes multi-shingle
        # and both-endpoints-probing collisions so the verify join
        # counts each pair exactly once
        a = ranked.filter(F.col("_rn") <= plen).select(
            F.col(id_col).alias("id_a"), "sh"
        )
        cand = (
            a.join(
                postings.unionByName(bp).select(
                    F.col(id_col).alias("id_b"), "sh"
                ),
                "sh",
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                F.least(F.col("id_a"), F.col("id_b")).alias("id_a"),
                F.greatest(F.col("id_a"), F.col("id_b")).alias("id_b"),
            )
            .distinct()
        )
        # exact-Jaccard verify (ngram_jaccard_pairs' round-6 rule):
        # the AllPairs length filter (J ≥ τ ⇒ τ·max ≤ min) prunes
        # before the intersection recount; the recount is the one-shot
        # prefix variant's candidate-restricted count-join — |A| probe
        # rows per pair, exact |A∩B| per survivor. The broadcast hint
        # is gated on a measured count (a multi-million-row hinted
        # broadcast was measured at 30s where the shuffle join takes
        # seconds).
        candf = (
            cand.join(sz_a, "id_a")
            .join(sz_b, "id_b")
            .filter(
                F.greatest("sz_a", "sz_b") * threshold
                <= F.least("sz_a", "sz_b")
            )
            .transform(materialize)
        )
        verify_probe = (
            F.broadcast(candf) if candf.count() <= 200_000 else candf
        )
        pa = postings.unionByName(bp).select(F.col(id_col).alias("id_a"), "sh")
        pb = postings.unionByName(bp).select(F.col(id_col).alias("id_b"), "sh")
        scored = (
            pa.join(verify_probe, "id_a")
            .join(pb, ["id_b", "sh"])
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # naive count-join probe: collision counts ARE the exact
        # intersections, no recount needed — the cheaper exact plan
        # whenever the prefix cannot prune (identical edge output)
        a = bp.select(F.col(id_col).alias("id_a"), "sh")
        cross = (
            a.join(postings.select(F.col(id_col).alias("id_b"), "sh"), "sh")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        within = (
            a.join(bp.select(F.col(id_col).alias("id_b"), "sh"), "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        scored = (
            cross.unionByName(within).join(sz_a, "id_a").join(sz_b, "id_b")
        )
    edges = (
        scored.filter(
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            )
            >= threshold
        )
        .select("id_a", "id_b")
        # no materialize: the single consumer is the label lift, and
        # connected_components_star materializes its canonical edge
        # set (this subtree included) exactly once anyway
    )

    # --- bounded label-level re-label (er_resolve_increment step 3) ----
    labels_now = (
        registry.select(id_col, "label")
        .unionByName(new_rows.select(id_col, F.col(id_col).alias("label")))
        .transform(materialize)
    )
    la = labels_now.select(F.col(id_col).alias("id_a"), F.col("label").alias("la"))
    lb = labels_now.select(F.col(id_col).alias("id_b"), F.col("label").alias("lb"))
    lbl_edges = (
        edges.join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("id_a"), F.col("lb").alias("id_b"))
    )
    relabel = connected_components_star(lbl_edges).select(
        F.col("node").alias("old_lbl"), F.col("label").alias("new_lbl")
    ).transform(materialize)

    doc_label = (
        labels_now.join(relabel, labels_now["label"] == relabel["old_lbl"], "left")
        .select(
            id_col,
            F.coalesce(F.col("new_lbl"), labels_now["label"]).alias("label"),
        )
    )
    doc_rows = (
        registry.select(id_col, "n_tokens", "n_sh")
        .unionByName(new_rows)
        .join(doc_label, id_col)
        .transform(materialize)
    )

    # --- kept/canonical: recompute touched components only -------------
    # touched = components that gained members (every new doc's final
    # label) or merged/re-labeled (every re-label target — merge
    # winners map to themselves in the star output, so the gaining
    # side is covered)
    touched = (
        doc_rows.join(new_rows.select(id_col), id_col, "leftsemi")
        .select("label")
        .unionByName(relabel.select(F.col("new_lbl").alias("label")))
        .distinct()
        .transform(materialize)
    )
    w = Window.partitionBy("label").orderBy(F.desc("n_tokens"), F.asc(id_col))
    recomputed = (
        doc_rows.join(touched, "label", "leftsemi")
        .select(
            id_col,
            "n_tokens",
            "n_sh",
            "label",
            F.first(id_col).over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("canonical_id"),
            (F.row_number().over(w) == 1).alias("kept"),
        )
    )
    # untouched components: labels unchanged (not re-labeled), members
    # unchanged (no new docs landed there) — stored flags stand. The
    # anti-join set must ALSO cover the losing side of every merge:
    # a registry row whose label was re-mapped carries the OLD label,
    # which is not in `touched` (that holds merge WINNERS and new-doc
    # labels) — without old_lbl here the row would survive the
    # anti-join AND reappear re-labeled from the recompute (duplicate)
    touched_old = touched.unionByName(
        relabel.select(F.col("old_lbl").alias("label"))
    )
    untouched = registry.join(touched_old, "label", "left_anti").select(
        id_col, "n_tokens", "n_sh", "label", "canonical_id", "kept"
    )
    new_registry = untouched.unionByName(
        recomputed.select(
            id_col, "n_tokens", "n_sh", "label", "canonical_id", "kept"
        )
    )
    new_postings = postings.unionByName(bp)
    return new_registry, new_postings
