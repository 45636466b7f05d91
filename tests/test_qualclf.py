"""Tests for the trained hashed-feature quality classifier
(`operators/qualclf.py`): exact-integer training replay vs an
independent python reference, planted-vocabulary separability, partition
invariance of the trained weights, and the zero-shuffle scoring plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import qualclf as QC


@pytest.fixture(scope="module")
def planted(spark):
    """Two disjoint content vocabularies + shared filler: linearly
    separable, so the trained model must classify perfectly."""
    import random

    rng = random.Random(7)
    a = [f"alpha{i}" for i in range(30)]
    b = [f"beta{i}" for i in range(30)]
    shared = [f"common{i}" for i in range(10)]
    rows = []
    for d in range(200):
        y = d % 2
        vocab = (a if y else b) + shared
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(40)),
                     "en" if y else "xx", "s", 40))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _python_train(rows, n_buckets, n_steps, lr_num, lr_den):
    """Independent integer-GD reference over collected (buckets, y)."""
    n = len(rows)
    den = n * lr_den
    w = [0] * (n_buckets + 1)
    for _ in range(n_steps):
        grads = [0] * (n_buckets + 1)
        for bs, y in rows:
            m = sum(w[b] for b in bs)
            z = m / (1_000_000.0 * len(bs))
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            e = math.floor((p - y) * 1_000_000.0 / len(bs))
            for b in bs:
                grads[b] += e
        w = [w[b] - (grads[b] * lr_num) // den for b in range(n_buckets + 1)]
    return w


def test_training_matches_python_reference_exactly(spark, planted):
    rows = [
        (r["bs"], r["y"])
        for r in planted.select(
            QC._buckets_col(F.col("text"), QC.QC_BUCKETS, QC.QC_SEED, "portable")
            .alias("bs"),
            (F.col("lang") == "en").cast("long").alias("y"),
        ).collect()
    ]
    want = _python_train(rows, QC.QC_BUCKETS, QC.QC_STEPS, QC.QC_LR_NUM, QC.QC_LR_DEN)
    got = QC.train_quality_classifier(planted)
    assert got == want


def test_planted_vocabularies_classified_perfectly(spark, planted):
    out = QC.quality_clf_scores(planted).collect()
    assert len(out) == 200
    acc = sum((r["lang"] == "en") == (r["pred"] == 1) for r in out) / len(out)
    assert acc == 1.0
    z_en = [r["score_micro"] for r in out if r["lang"] == "en"]
    z_xx = [r["score_micro"] for r in out if r["lang"] != "en"]
    assert min(z_en) > 0 > max(z_xx)


def test_trained_weights_partition_invariant(spark, planted):
    w1 = QC.train_quality_classifier(planted.repartition(1))
    w13 = QC.train_quality_classifier(planted.repartition(13))
    assert w1 == w13


def test_scoring_plan_has_no_join_or_exchange(spark, planted):
    model = QC.train_quality_classifier(planted)
    plan = (
        QC.quality_clf_scores(planted, model=model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_empty_and_short_docs_flow_through(spark):
    docs = spark.createDataFrame(
        [(0, "", "en", "s", 0), (1, "x", "xx", "s", 1), (2, "alpha words here", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in QC.quality_clf_scores(docs).collect()}
    # bias sentinel keeps nf >= 1: every doc gets a finite score
    assert set(out) == {0, 1, 2}
    assert all(isinstance(out[d]["score_micro"], int) for d in out)
