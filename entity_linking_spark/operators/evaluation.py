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


def dictionary_coverage(records: DataFrame, dict_blocks: DataFrame) -> DataFrame:
    """One-row coverage audit: how many records probe at least one alias-
    dictionary hit — the reference's dictionary-coverage analysis
    (`evaluation/VerifyDictionaryMentions.java:30-90`) as an aggregate.
    Output: (n_records, n_covered, coverage)."""
    n = records.agg(F.count("*").alias("n_records"))
    cov = dict_blocks.agg(
        F.countDistinct("rec_key").alias("n_covered")
    )
    return (
        n.crossJoin(cov)
        .select(
            "n_records",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_records").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def dictionary_coverage_sql(records_rel: str, dict_blocks_rel: str) -> str:
    return f"""
    SELECT n_records, n_covered,
           round(CAST(n_covered AS DOUBLE) / CAST(n_records AS DOUBLE), 6) AS coverage
    FROM (SELECT count(*) AS n_records FROM ({records_rel}))
    CROSS JOIN (SELECT count(DISTINCT rec_key) AS n_covered FROM ({dict_blocks_rel}))
    """


def clustering_agreement(clusters_a: DataFrame, clusters_b: DataFrame) -> DataFrame:
    """Pairwise agreement (Rand index) between two clusterings of the
    same records — the `debug/DiffSolutions.java:14-112` analog, computed
    scale-correctly from the CONTINGENCY TABLE instead of materializing
    O(N²) record pairs: with n_ij = |cluster_i(A) ∩ cluster_j(B)|,

        agree_both    = Σ_ij C(n_ij, 2)          (same in A and B)
        only_a        = Σ_i C(n_i·, 2) − agree_both
        only_b        = Σ_j C(n_·j, 2) − agree_both
        agree_neither = C(N, 2) − the rest
        rand          = (agree_both + agree_neither) / C(N, 2)

    Three groupBys over N rows total — this is how two 10^12-row
    clusterings (e.g. nightly batch vs incremental fold) are compared in
    production. Inputs: (rec_key, cluster_id) each; inner-joined on
    rec_key. Output: one exact-integer row + rand (round 6)."""
    j = clusters_a.select(
        "rec_key", F.col("cluster_id").alias("a_cl")
    ).join(
        clusters_b.select("rec_key", F.col("cluster_id").alias("b_cl")), "rec_key"
    )
    # shiftright = exact integer halving of the (always even) n·(n−1),
    # staying in long arithmetic — float division loses exactness past
    # 2^53, which is real at 10^12-row cluster sizes
    c2 = lambda c: F.shiftright((c * (c - 1)).cast("long"), 1)  # noqa: E731
    cells = j.groupBy("a_cl", "b_cl").agg(F.count("*").alias("n")).agg(
        F.sum(c2(F.col("n"))).alias("agree_both")
    )
    rows_a = j.groupBy("a_cl").agg(F.count("*").alias("n")).agg(
        F.sum(c2(F.col("n"))).alias("same_a")
    )
    rows_b = j.groupBy("b_cl").agg(F.count("*").alias("n")).agg(
        F.sum(c2(F.col("n"))).alias("same_b")
    )
    tot = j.agg(
        c2(F.count("*")).alias("pairs_total"), F.count("*").alias("n_records")
    )
    out = tot.crossJoin(cells).crossJoin(rows_a).crossJoin(rows_b)
    only_a = F.col("same_a") - F.col("agree_both")
    only_b = F.col("same_b") - F.col("agree_both")
    neither = F.col("pairs_total") - F.col("same_a") - F.col("same_b") + F.col("agree_both")
    return out.select(
        "n_records",
        "pairs_total",
        "agree_both",
        only_a.alias("only_a"),
        only_b.alias("only_b"),
        neither.alias("agree_neither"),
        F.round(
            (F.col("agree_both") + neither).cast("double")
            / F.greatest(F.col("pairs_total"), F.lit(1)).cast("double"),
            6,
        ).alias("rand_index"),
    )


def clustering_agreement_sql(clusters_a_rel: str, clusters_b_rel: str) -> str:
    c2 = lambda c: f"CAST(({c} * ({c} - 1)) // 2 AS BIGINT)"  # noqa: E731
    return f"""
    SELECT t.n_records, t.pairs_total, c.agree_both,
           ra.same_a - c.agree_both AS only_a,
           rb.same_b - c.agree_both AS only_b,
           t.pairs_total - ra.same_a - rb.same_b + c.agree_both AS agree_neither,
           round(CAST(c.agree_both + t.pairs_total - ra.same_a - rb.same_b + c.agree_both AS DOUBLE)
                 / CAST(greatest(t.pairs_total, 1) AS DOUBLE), 6) AS rand_index
    FROM (
      SELECT count(*) AS n_records, {c2('count(*)')} AS pairs_total
      FROM ({clusters_a_rel}) a JOIN ({clusters_b_rel}) b USING (rec_key)
    ) t
    CROSS JOIN (
      SELECT CAST(sum({c2('n')}) AS BIGINT) AS agree_both FROM (
        SELECT count(*) AS n
        FROM ({clusters_a_rel}) a JOIN ({clusters_b_rel}) b USING (rec_key)
        GROUP BY a.cluster_id, b.cluster_id
      )
    ) c
    CROSS JOIN (
      SELECT CAST(sum({c2('n')}) AS BIGINT) AS same_a FROM (
        SELECT count(*) AS n
        FROM ({clusters_a_rel}) a JOIN ({clusters_b_rel}) b USING (rec_key)
        GROUP BY a.cluster_id
      )
    ) ra
    CROSS JOIN (
      SELECT CAST(sum({c2('n')}) AS BIGINT) AS same_b FROM (
        SELECT count(*) AS n
        FROM ({clusters_a_rel}) a JOIN ({clusters_b_rel}) b USING (rec_key)
        GROUP BY b.cluster_id
      )
    ) rb
    """
