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
2. the batch's shingle postings probe the ACCUMULATED index (new×old)
   and each other (new×new) — candidate pairs share ≥1 shingle, so
   every true Jaccard edge incident to a new doc is found, and work is
   ∝ the batch's posting lists, never corpus²;
3. candidates verify with EXACT Jaccard (intersection counts from the
   probe; set sizes from the registry for old docs) — the same
   round-to-6 ≥ threshold rule as ``ngram_jaccard_pairs``;
4. verified edges lift to the LABEL level and a bounded star-CC
   re-label merges touched components only (the mini-graph is ∝ batch
   edges — ``er_resolve_increment`` step 3);
5. ``kept``/``canonical_id`` recompute ONLY for touched components
   (new members, merges, or re-labels); untouched rows carry their
   stored flags forward — which is what lets the partitioned
   versioned state (``streaming/versioned.py``) skip their buckets.

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

    Scale: candidate generation joins the BATCH's postings against the
    index (shuffle ∝ batch posting lists + their collisions); the
    re-label mini-graph is ∝ batch edges; the kept/canonical window
    partitions by touched component only. The full registry is scanned
    once per fold as the probe index — the write side is the
    partitioned versioned layout's job (touched buckets only)."""
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
    cand = cross.unionByName(within)

    # --- exact-Jaccard verify (ngram_jaccard_pairs' round-6 rule) ------
    sizes = registry.select(F.col(id_col), "n_sh").unionByName(
        new_rows.select(id_col, "n_sh")
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("sz_b"))
    edges = (
        cand.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(
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
