"""Pairwise evaluation — the engine's `Verifier` analog.

Reference parity: `evaluation/Verifier.java:24-47` computes precision /
recall from solution-vs-golden set membership; our pairwise variant does
the same over record pairs, as the north_rule specifies: labeled pairs
*at a shared blocking key* are scored for same-cluster agreement, and
F1 ≥ 0.99 is the gate.

Everything is DataFrame joins + one aggregate — no driver-side loops, so
the same evaluation runs at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_labels(
    candidate_pairs: DataFrame, gold: DataFrame, records: DataFrame
) -> DataFrame:
    """Attach gold labels to candidate pairs.

    gold: (conv_id, turn_idx, entity_id, ...) — one label per record.
    Output: (a_key, b_key, gold_match int).
    """
    keyed = records.select("rec_key", "conv_id", "turn_idx").join(
        gold.select("conv_id", "turn_idx", "entity_id"), ["conv_id", "turn_idx"]
    )
    ga = keyed.select(F.col("rec_key").alias("a_key"), F.col("entity_id").alias("a_ent"))
    gb = keyed.select(F.col("rec_key").alias("b_key"), F.col("entity_id").alias("b_ent"))
    return (
        candidate_pairs.join(ga, "a_key")
        .join(gb, "b_key")
        .select(
            "a_key",
            "b_key",
            (F.col("a_ent") == F.col("b_ent")).cast("int").alias("gold_match"),
        )
    )


def pairwise_confusion(
    labeled_pairs: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Join predicted same-cluster decisions onto labeled pairs and count
    TP/FP/FN/TN in one aggregate. `clusters`: (rec_key, cluster_id)."""
    ca = clusters.select(F.col("rec_key").alias("a_key"), F.col("cluster_id").alias("a_cl"))
    cb = clusters.select(F.col("rec_key").alias("b_key"), F.col("cluster_id").alias("b_cl"))
    dec = (
        labeled_pairs.join(ca, "a_key")
        .join(cb, "b_key")
        .withColumn("pred_match", (F.col("a_cl") == F.col("b_cl")).cast("int"))
    )
    return dec.agg(
        F.sum(((F.col("pred_match") == 1) & (F.col("gold_match") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("pred_match") == 1) & (F.col("gold_match") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("pred_match") == 0) & (F.col("gold_match") == 1)).cast("long")).alias("fn"),
        F.sum(((F.col("pred_match") == 0) & (F.col("gold_match") == 0)).cast("long")).alias("tn"),
    )


def f1_from_confusion(row) -> dict:
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def pairwise_f1(
    candidate_pairs: DataFrame,
    gold: DataFrame,
    records: DataFrame,
    clusters: DataFrame,
) -> dict:
    """End-to-end: label candidate pairs, join cluster decisions, F1."""
    labeled = pair_labels(candidate_pairs, gold, records)
    row = pairwise_confusion(labeled, clusters).collect()[0]
    return f1_from_confusion(row)


def blocking_recall(
    candidate_pairs: DataFrame, gold: DataFrame, records: DataFrame
) -> float:
    """Recall ceiling of the blocking stage: fraction of gold same-entity
    pairs that survive into the candidate set — the analog of the
    reference's max-achievable-recall accounting
    (`evaluation/VerifyMentionDetection.java:50-93`)."""
    keyed = records.select("rec_key", "conv_id", "turn_idx").join(
        gold.select("conv_id", "turn_idx", "entity_id"), ["conv_id", "turn_idx"]
    )
    a = keyed.select(F.col("rec_key").alias("a_key"), F.col("entity_id").alias("ent"))
    b = keyed.select(F.col("rec_key").alias("b_key"), F.col("entity_id").alias("ent"))
    gold_pairs = (
        a.join(b, "ent").filter(F.col("a_key") < F.col("b_key")).select("a_key", "b_key")
    )
    total = gold_pairs.count()
    if total == 0:
        return 1.0
    found = gold_pairs.join(candidate_pairs, ["a_key", "b_key"], "left_semi").count()
    return found / total
