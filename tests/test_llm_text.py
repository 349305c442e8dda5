"""The in-engine Naive Bayes classifier LEARNS when signal exists —
the registered query's corpus has label-independent text (its
docstring's honesty note), so the learning property is pinned here on
a signal-bearing fixture through the same ``nb_train_score`` function
the query runs."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
    _NB_TEST_MOD,
    nb_train_score,
)


def _corpus(spark):
    """Two classes with disjoint characteristic vocabulary plus shared
    filler; one test doc carries an unseen token (smoothing path)."""
    rows = []
    for i in range(40):
        lbl = "aa" if i % 2 == 0 else "bb"
        marker = "foo bar" if lbl == "aa" else "qux baz"
        text = f"{marker} common words here {marker}"
        if i == 0:
            text += " neverseentoken"  # test doc (0 % 5 == 0), unseen tok
        rows.append((i, lbl, text))
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_nb_learns_disjoint_vocab(spark):
    out = nb_train_score(_corpus(spark), _NB_TEST_MOD).collect()
    assert len(out) == 8  # doc_ids 0,5,10,...,35
    assert all(r["correct"] for r in out), [
        (r["doc_id"], r["gold_lang"], r["pred_lang"]) for r in out
    ]
    # both classes actually appear in the held-out predictions
    assert {r["pred_lang"] for r in out} == {"aa", "bb"}
    # scores are the rounded log-joint: strictly negative, finite
    assert all(r["nb_score"] < 0 for r in out)


def test_nb_prior_decides_signal_free_docs(spark):
    """With NO token signal (identical text everywhere) and imbalanced
    labels, NB must fall back to the majority prior — the exact regime
    the registered query's corpus is in."""
    rows = [
        (i, "maj" if i % 4 != 3 else "min", "same text for everyone")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = nb_train_score(docs, _NB_TEST_MOD).collect()
    assert len(out) == 8
    assert all(r["pred_lang"] == "maj" for r in out)


def test_lr_learns_separable_boundary(spark):
    """With enough GD steps the logistic model must classify the
    held-out split of its (linearly separable) label near-perfectly —
    the learning property, via the same lr_train_score core the
    registered query runs with 3 steps."""
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
        lr_train_score,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    out = lr_train_score(docs, _NB_TEST_MOD, rounds=40, rate=4.0).collect()
    assert len(out) > 10
    acc = sum(r["correct"] for r in out) / len(out)
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} after 40 steps"
    # both classes must appear in the held-out gold labels, or the
    # accuracy bar is vacuous
    assert {r["gold"] for r in out} == {True, False}


def test_lr_zero_rounds_scores_at_prior(spark):
    """The untrained model (0 GD steps, w = 0) must score every
    held-out doc at exactly p = 0.5 and predict positive everywhere
    (>= threshold) — pins the scoring path, the split, and the
    round-trip of the weight frame independent of training."""
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
        lr_train_score,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    out = lr_train_score(docs, _NB_TEST_MOD, rounds=0).collect()
    n_docs = docs.count()
    assert len(out) == sum(1 for i in range(n_docs) if i % _NB_TEST_MOD == 0)
    assert all(r["p_quality"] == 0.5 and r["pred"] for r in out)
    assert any(not r["correct"] for r in out)  # both label classes exist
