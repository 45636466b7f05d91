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


def adjusted_rand(clusters_a: DataFrame, clusters_b: DataFrame) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) between two clusterings —
    the chance-corrected companion to `clustering_agreement`'s raw Rand.
    Built ON the agreement frame's exact-integer pair counts, so the only
    float arithmetic is one fixed expression tree over a single row:

        A = agree_both + only_a, B = agree_both + only_b   (exact int64)
        E = A·B / pairs_total                              (expected index)
        ARI = (agree_both − E) / ((A+B)/2 − E)

    Every double op is correctly rounded on a pinned order, so the DuckDB
    twin matches bit-for-bit; round(·,6) only compresses the printout.
    den == 0 (both clusterings all-singleton or all-one) → ARI = 1 by the
    usual convention. Same 3-groupBy scale shape as clustering_agreement."""
    base = clustering_agreement(clusters_a, clusters_b)
    a = (F.col("agree_both") + F.col("only_a")).cast("long")
    b = (F.col("agree_both") + F.col("only_b")).cast("long")
    p_safe = F.greatest(F.col("pairs_total"), F.lit(1)).cast("double")
    e = (a.cast("double") * b) / p_safe
    num = F.col("agree_both").cast("double") - e
    den = ((a + b).cast("double") / F.lit(2.0)) - e
    ari = F.when(den == 0, F.lit(1.0)).otherwise(F.round(num / den, 6))
    return base.select(
        "n_records",
        "pairs_total",
        "agree_both",
        a.alias("same_a"),
        b.alias("same_b"),
        ari.alias("ari"),
    )


def adjusted_rand_sql(clusters_a_rel: str, clusters_b_rel: str) -> str:
    inner = clustering_agreement_sql(clusters_a_rel, clusters_b_rel)
    a = "CAST(agree_both + only_a AS BIGINT)"
    b = "CAST(agree_both + only_b AS BIGINT)"
    p_safe = "CAST(greatest(pairs_total, 1) AS DOUBLE)"
    e = f"((CAST({a} AS DOUBLE) * {b}) / {p_safe})"
    num = f"(CAST(agree_both AS DOUBLE) - {e})"
    den = f"((CAST({a} + {b} AS DOUBLE) / 2.0) - {e})"
    return f"""
    SELECT n_records, pairs_total, agree_both,
           {a} AS same_a, {b} AS same_b,
           CASE WHEN {den} = 0 THEN 1.0 ELSE round({num} / {den}, 6) END AS ari
    FROM ({inner})
    """


def bcubed(clusters: DataFrame, truth: DataFrame) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of `clusters`
    against the `truth` partition — the per-record ER metric that, unlike
    pairwise F1, weights every record equally instead of quadratically
    favoring big clusters. Inputs: (rec_key, cluster_id) each (truth's
    cluster_id column is its entity/partition id).

    Scale-correct form: with n_ij the contingency cell counts,
    B³ precision = (1/N)·Σ_i (Σ_j n_ij²)/n_i· and recall mirrors over
    columns — three groupBys over N rows total, never per-record pairs
    (the clustering_agreement discipline). Exactness: per-group
    contributions are floor-quantized to micro units (floor(1e6·S/n), one
    pinned double division each — the dsir/qualclf quantization argument),
    then summed as exact int64 and divided by N in exact integer
    arithmetic; quantization biases each metric < 1e-6 absolute and makes
    the value engine-portable. Output (one row): n_records,
    bcubed_precision_micro, bcubed_recall_micro, bcubed_f1_micro.
    int64 bounds: per-cell n_ij < 3e9 (n² < 2^63) and Σ quantized
    contributions ≤ 1e6·N — fine through 10^12 records."""
    j = clusters.select(
        "rec_key", F.col("cluster_id").alias("a_cl")
    ).join(truth.select("rec_key", F.col("cluster_id").alias("b_cl")), "rec_key")
    cells = j.groupBy("a_cl", "b_cl").agg(F.count("*").alias("n"))
    quant = lambda s, m: F.floor(  # noqa: E731
        (F.lit(1_000_000.0) * s) / m
    ).cast("long")
    per_a = (
        cells.groupBy("a_cl")
        .agg(F.sum(F.col("n") * F.col("n")).alias("s"), F.sum("n").alias("m"))
        .agg(
            F.sum(quant(F.col("s"), F.col("m"))).alias("p_sum"),
            F.sum("m").alias("n_records"),
        )
    )
    per_b = (
        cells.groupBy("b_cl")
        .agg(F.sum(F.col("n") * F.col("n")).alias("s"), F.sum("n").alias("m"))
        .agg(F.sum(quant(F.col("s"), F.col("m"))).alias("r_sum"))
    )
    out = per_a.crossJoin(per_b)
    # pinned double division + floor (NOT integer //) so the SQL twin can
    # use the identical correctly-rounded expression tree
    n_safe = F.greatest(F.col("n_records"), F.lit(1)).cast("double")
    p = F.floor(F.col("p_sum").cast("double") / n_safe).cast("long")
    r = F.floor(F.col("r_sum").cast("double") / n_safe).cast("long")
    f1 = F.floor(
        ((F.lit(2.0) * p) * r) / F.greatest((p + r).cast("double"), F.lit(1.0))
    ).cast("long")
    return out.select(
        "n_records",
        p.alias("bcubed_precision_micro"),
        r.alias("bcubed_recall_micro"),
        f1.alias("bcubed_f1_micro"),
    )


def bcubed_sql(clusters_rel: str, truth_rel: str, prefix_ctes: str = "") -> str:
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    cells = f"""
      SELECT a.cluster_id AS a_cl, b.cluster_id AS b_cl, count(*) AS n
      FROM ({clusters_rel}) a JOIN ({truth_rel}) b USING (rec_key)
      GROUP BY a.cluster_id, b.cluster_id
    """
    quant = "CAST(floor((1000000.0 * s) / m) AS BIGINT)"

    def grp(key: str) -> str:
        return f"""(
      SELECT CAST(sum({quant}) AS BIGINT) AS q_sum, CAST(sum(m) AS BIGINT) AS n_rec
      FROM (SELECT CAST(sum(n * n) AS BIGINT) AS s, CAST(sum(n) AS BIGINT) AS m
            FROM cells GROUP BY {key})
    )"""

    micro = (
        "CAST(floor(CAST(q_sum AS DOUBLE) "
        "/ CAST(greatest(n_rec, 1) AS DOUBLE)) AS BIGINT)"
    )
    return f"""
    WITH {pre} cells AS MATERIALIZED ({cells}),
    pa AS {grp('a_cl')},
    pb AS {grp('b_cl')},
    pr AS (
      SELECT pa.n_rec AS n_records,
             (SELECT {micro} FROM pa) AS p,
             (SELECT {micro} FROM pb) AS r
      FROM pa
    )
    SELECT n_records, p AS bcubed_precision_micro, r AS bcubed_recall_micro,
           CAST(floor(((2.0 * p) * r)
                      / greatest(CAST(p + r AS DOUBLE), 1.0)) AS BIGINT)
             AS bcubed_f1_micro
    FROM pr
    """


def blocking_quality(candidate_pairs: DataFrame, clusters: DataFrame) -> DataFrame:
    """One-row blocking audit: reduction ratio and pairs completeness —
    the two standard blocking metrics (Christen 2012) — measured against
    the final clustering as the same-entity partition. Completeness here
    is the fraction of same-cluster pairs DIRECTLY enumerated by blocking
    (the rest were linked transitively), i.e. how much the transitive
    closure is doing; reduction ratio = 1 − |candidates| / C(N,2).

    Never enumerates same-cluster pairs: the denominator is Σ C(size,2)
    over cluster sizes (one groupBy), the numerator joins the candidate
    list (already bounded by the block cap) to the cluster map twice.
    Ratios are floor-quantized micro ints over pinned double divisions —
    exact-int overflow-free through 10^12 records (C(N,2) is computed in
    double, never as int64)."""
    ca = clusters.select(F.col("rec_key").alias("a_key"), F.col("cluster_id").alias("a_cl"))
    cb = clusters.select(F.col("rec_key").alias("b_key"), F.col("cluster_id").alias("b_cl"))
    hits = (
        candidate_pairs.join(ca, "a_key")
        .join(cb, "b_key")
        .agg(
            F.count("*").alias("n_candidate_pairs"),
            F.sum((F.col("a_cl") == F.col("b_cl")).cast("long")).alias(
                "n_intra_candidates"
            ),
        )
    )
    c2 = lambda c: F.shiftright((c * (c - 1)).cast("long"), 1)  # noqa: E731
    tot = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(c2(F.col("n"))).alias("n_intra_total"),
            F.sum("n").alias("n_records"),
        )
    )
    out = hits.crossJoin(tot)
    comp = F.floor(
        (F.lit(1_000_000.0) * F.col("n_intra_candidates"))
        / F.greatest(F.col("n_intra_total"), F.lit(1)).cast("double")
    ).cast("long")
    c2n = (F.col("n_records").cast("double") * (F.col("n_records") - F.lit(1))) / F.lit(2.0)
    frac = F.col("n_candidate_pairs").cast("double") / F.greatest(c2n, F.lit(1.0))
    red = F.floor(F.lit(1_000_000.0) * (F.lit(1.0) - frac)).cast("long")
    return out.select(
        "n_records",
        F.coalesce("n_candidate_pairs", F.lit(0)).alias("n_candidate_pairs"),
        F.coalesce("n_intra_candidates", F.lit(0)).alias("n_intra_candidates"),
        "n_intra_total",
        comp.alias("pairs_completeness_micro"),
        red.alias("reduction_ratio_micro"),
    )


def blocking_family_quality(
    labeled_pairs: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Per-FAMILY blocking audit: `blocking_quality` grouped by a
    `family` label column on the pair set — one row per blocking scheme
    with the same completeness / reduction-ratio metrics, so the
    families (key-equality, LSH, phonetic, sorted-neighborhood, …) are
    directly comparable on one table: which scheme buys how much recall
    for how many candidate pairs. Shape: the candidate side crosses one
    partial-agg'd groupBy(family); the 1-row cluster totals broadcast
    back; nothing per-cluster is enumerated (Σ C(size,2) by groupBy,
    same as the ungrouped audit)."""
    ca = clusters.select(
        F.col("rec_key").alias("a_key"), F.col("cluster_id").alias("a_cl")
    )
    cb = clusters.select(
        F.col("rec_key").alias("b_key"), F.col("cluster_id").alias("b_cl")
    )
    hits = (
        labeled_pairs.join(ca, "a_key")
        .join(cb, "b_key")
        .groupBy("family")
        .agg(
            F.count("*").alias("n_candidate_pairs"),
            F.sum((F.col("a_cl") == F.col("b_cl")).cast("long")).alias(
                "n_intra_candidates"
            ),
        )
    )
    c2 = lambda c: F.shiftright((c * (c - 1)).cast("long"), 1)  # noqa: E731
    tot = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(c2(F.col("n"))).alias("n_intra_total"),
            F.sum("n").alias("n_records"),
        )
    )
    out = hits.crossJoin(F.broadcast(tot))
    comp = F.floor(
        (F.lit(1_000_000.0) * F.col("n_intra_candidates"))
        / F.greatest(F.col("n_intra_total"), F.lit(1)).cast("double")
    ).cast("long")
    c2n = (
        F.col("n_records").cast("double") * (F.col("n_records") - F.lit(1))
    ) / F.lit(2.0)
    frac = F.col("n_candidate_pairs").cast("double") / F.greatest(
        c2n, F.lit(1.0)
    )
    red = F.floor(F.lit(1_000_000.0) * (F.lit(1.0) - frac)).cast("long")
    return out.select(
        "family",
        "n_records",
        "n_candidate_pairs",
        "n_intra_candidates",
        "n_intra_total",
        comp.alias("pairs_completeness_micro"),
        red.alias("reduction_ratio_micro"),
    )


def blocking_family_quality_sql(
    labeled_pairs_rel: str, clusters_rel: str
) -> str:
    return f"""
    SELECT h.family, t.n_records, h.n_candidate_pairs, h.n_intra_candidates,
           t.n_intra_total,
           CAST(floor((1000000.0 * h.n_intra_candidates)
                      / CAST(greatest(t.n_intra_total, 1) AS DOUBLE)) AS BIGINT)
             AS pairs_completeness_micro,
           CAST(floor(1000000.0 * (1.0 - (CAST(h.n_candidate_pairs AS DOUBLE)
                / greatest((CAST(t.n_records AS DOUBLE) * (t.n_records - 1)) / 2.0,
                           1.0)))) AS BIGINT)
             AS reduction_ratio_micro
    FROM (
      SELECT p.family, count(*) AS n_candidate_pairs,
             coalesce(CAST(sum(CAST(ca.cluster_id = cb.cluster_id AS BIGINT)) AS BIGINT), 0)
               AS n_intra_candidates
      FROM ({labeled_pairs_rel}) p
      JOIN ({clusters_rel}) ca ON p.a_key = ca.rec_key
      JOIN ({clusters_rel}) cb ON p.b_key = cb.rec_key
      GROUP BY p.family
    ) h
    CROSS JOIN (
      SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS n_intra_total,
             CAST(sum(n) AS BIGINT) AS n_records
      FROM (SELECT count(*) AS n FROM ({clusters_rel}) GROUP BY cluster_id)
    ) t
    """


def blocking_quality_sql(pairs_rel: str, clusters_rel: str) -> str:
    return f"""
    SELECT t.n_records, h.n_candidate_pairs, h.n_intra_candidates,
           t.n_intra_total,
           CAST(floor((1000000.0 * h.n_intra_candidates)
                      / CAST(greatest(t.n_intra_total, 1) AS DOUBLE)) AS BIGINT)
             AS pairs_completeness_micro,
           CAST(floor(1000000.0 * (1.0 - (CAST(h.n_candidate_pairs AS DOUBLE)
                / greatest((CAST(t.n_records AS DOUBLE) * (t.n_records - 1)) / 2.0,
                           1.0)))) AS BIGINT)
             AS reduction_ratio_micro
    FROM (
      SELECT count(*) AS n_candidate_pairs,
             coalesce(CAST(sum(CAST(ca.cluster_id = cb.cluster_id AS BIGINT)) AS BIGINT), 0)
               AS n_intra_candidates
      FROM ({pairs_rel}) p
      JOIN ({clusters_rel}) ca ON p.a_key = ca.rec_key
      JOIN ({clusters_rel}) cb ON p.b_key = cb.rec_key
    ) h
    CROSS JOIN (
      SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS n_intra_total,
             CAST(sum(n) AS BIGINT) AS n_records
      FROM (SELECT count(*) AS n FROM ({clusters_rel}) GROUP BY cluster_id)
    ) t
    """


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


def transitivity_conflicts(edges: DataFrame, candidates: DataFrame) -> DataFrame:
    """One-row audit of how self-consistent the pairwise match decisions
    are — the number that says whether transitive closure is safe or
    correlation clustering (operators/corrclust.py) is warranted:

      n_two_hop    distinct pairs (a, c) joined by a 2-edge match path
                   through some b (the pairs closure will merge),
      n_closed     ... that are ALSO a direct match edge (consistent
                   triangle),
      n_conflict   ... that were scored as a candidate pair and judged
                   NON-match (the scorer actively disagrees with the
                   merge closure performs) — each is a KwikCluster
                   "disagreement",
      n_unscored   ... never even candidates (blocking placed a and c in
                   no common block; closure merges them sight unseen).

    Scale shape: the wedge set is one self-join of the symmetric edge
    list on the midpoint — bounded by Σ deg(b)², which the block cap
    bounds structurally (max degree ≤ blocks-per-record × cap); then two
    LEFT joins against edge/candidate pair sets and ONE 1-row aggregate.
    All counts exact integers."""
    sym = edges.select(
        F.col("a_key").alias("m"), F.col("b_key").alias("x")
    ).union(edges.select(F.col("b_key").alias("m"), F.col("a_key").alias("x")))
    l, r = sym.alias("l"), sym.alias("r")
    wedges = (
        l.join(r, "m")
        .filter(F.col("l.x") < F.col("r.x"))
        .select(F.col("l.x").alias("a_key"), F.col("r.x").alias("b_key"))
        .distinct()
    )
    # canonicalize the probe sides internally (ADVICE r4): wedges are
    # emitted (min, max)-oriented, so a caller passing reversed or
    # symmetric edge/candidate lists would otherwise miss the left joins
    # and silently undercount n_closed / n_conflict. least/greatest +
    # distinct is a no-op on already-canonical distinct inputs (the
    # pipeline's), so the gated query's values are unchanged.
    canon = [
        F.least("a_key", "b_key").alias("a_key"),
        F.greatest("a_key", "b_key").alias("b_key"),
    ]
    e = edges.select(*canon).distinct().withColumn("is_edge", F.lit(1))
    c = candidates.select(*canon).distinct().withColumn("is_cand", F.lit(1))
    tagged = wedges.join(e, ["a_key", "b_key"], "left").join(
        c, ["a_key", "b_key"], "left"
    )
    closed = F.coalesce("is_edge", F.lit(0))
    cand = F.coalesce("is_cand", F.lit(0))
    return tagged.agg(
        F.count(F.lit(1)).alias("n_two_hop"),
        F.coalesce(F.sum(closed), F.lit(0)).cast("long").alias("n_closed"),
        F.coalesce(F.sum((1 - closed) * cand), F.lit(0))
        .cast("long")
        .alias("n_conflict"),
        F.coalesce(F.sum((1 - closed) * (1 - cand)), F.lit(0))
        .cast("long")
        .alias("n_unscored"),
    )


def transitivity_conflicts_sql(
    edges_rel: str, candidates_rel: str, prefix_ctes: str = ""
) -> str:
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    # tc_e / tc_c hoist the input relations into MATERIALIZED CTEs
    # (ADVICE r4: edges_rel was inlined three times, so a full-pipeline
    # relation was evaluated thrice per audit) and canonicalize
    # orientation — the Spark twin's least/greatest + distinct, verbatim.
    return f"""
    WITH {pre} tc_e AS MATERIALIZED (
      SELECT DISTINCT least(a_key, b_key) AS a_key,
                      greatest(a_key, b_key) AS b_key
      FROM ({edges_rel})
    ),
    tc_c AS MATERIALIZED (
      SELECT DISTINCT least(a_key, b_key) AS a_key,
                      greatest(a_key, b_key) AS b_key
      FROM ({candidates_rel})
    ),
    tc_sym AS (
      SELECT a_key AS m, b_key AS x FROM tc_e
      UNION ALL SELECT b_key AS m, a_key AS x FROM tc_e
    ),
    tc_wedge AS (
      SELECT DISTINCT l.x AS a_key, r.x AS b_key
      FROM tc_sym l JOIN tc_sym r USING (m)
      WHERE l.x < r.x
    ),
    tc_tag AS (
      SELECT w.a_key, w.b_key,
             CASE WHEN e.a_key IS NULL THEN 0 ELSE 1 END AS closed,
             CASE WHEN c.a_key IS NULL THEN 0 ELSE 1 END AS cand
      FROM tc_wedge w
      LEFT JOIN tc_e e
        ON w.a_key = e.a_key AND w.b_key = e.b_key
      LEFT JOIN tc_c c
        ON w.a_key = c.a_key AND w.b_key = c.b_key
    )
    SELECT CAST(count(*) AS BIGINT) AS n_two_hop,
           CAST(coalesce(sum(closed), 0) AS BIGINT) AS n_closed,
           CAST(coalesce(sum((1 - closed) * cand), 0) AS BIGINT) AS n_conflict,
           CAST(coalesce(sum((1 - closed) * (1 - cand)), 0) AS BIGINT) AS n_unscored
    FROM tc_tag
    """
