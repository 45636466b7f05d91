"""Tests for the full scorer (T9 popularity / T11 prior / T10 log-PMI λ
over block co-membership), the calibration sweep over its combined score,
personalized-PageRank priors (G5), and the Milne-Witten per-doc fanout
bound."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import calibration as CAL
from entity_linking_spark.operators import evaluation as E
from entity_linking_spark.operators import graphwalk as GW
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.operators import scoring as S
from entity_linking_spark.operators import tfidf as TFI
from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
from entity_linking_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def scored(spark):
    tdf, gdf = synth_transcripts(spark, n_convs=60, n_entities=12, seed=42)
    cfg = LinkingConfig()
    records = B.prepare_records(tdf).cache()
    capped = P.cap_blocks(build_blocks(records, cfg), cfg.block_cap).cache()
    prs = P.block_pairs(capped, cfg.block_cap).cache()
    feats = S.pair_features(prs, records)
    stats = S.pair_block_stats(prs, capped)
    full = S.scored_pairs_full(feats, stats, capped).cache()
    return records, gdf, prs, full


def test_scored_pairs_full_feature_ranges(scored):
    """T11 prior ∈ (0,1]; T10 λ <= 0 (co <= min block count <= popularity);
    T9 popularity >= 2 (1 + at least one block); combined score ∈ (0,1)."""
    _, _, _, full = scored
    row = full.agg(
        F.min("prior").alias("pmin"), F.max("prior").alias("pmax"),
        F.max("lam").alias("lmax"), F.min("pop_a").alias("popmin"),
        F.min("co").alias("comin"),
        F.min("score_full").alias("smin"), F.max("score_full").alias("smax"),
    ).collect()[0]
    assert 0.0 < row["pmin"] and row["pmax"] <= 1.0
    assert row["lmax"] <= 1e-9  # ln co - ln pop_a - ln pop_b < 0
    assert row["popmin"] >= 2
    assert row["comin"] >= 1  # every candidate pair shares >= 1 block
    assert 0.0 < row["smin"] and row["smax"] < 1.0


def test_score_full_separates_gold(scored):
    """Gold same-entity pairs must score higher on average than non-gold
    pairs — the prior/λ features add signal, not noise."""
    records, gdf, prs, full = scored
    labeled = E.pair_labels(prs, gdf, records).join(full, ["a_key", "b_key"])
    m = (
        labeled.groupBy("gold_match")
        .agg(F.avg("score_full").alias("avg"), F.avg("prior").alias("avg_prior"))
        .collect()
    )
    by = {r["gold_match"]: r for r in m}
    assert by[1]["avg"] > by[0]["avg"] + 0.2
    assert by[1]["avg_prior"] > by[0]["avg_prior"]  # T11 carries signal alone


def test_calibration_sweep_over_score_full(scored):
    """VerifyBaseline-style threshold sweep over the full score: some
    threshold must reach F1 >= 0.95 on blocked candidate pairs."""
    records, gdf, prs, full = scored
    labeled = (
        E.pair_labels(prs, gdf, records)
        .join(full, ["a_key", "b_key"])
        .select(F.col("score_full").alias("score"), "gold_match")
    )
    best = CAL.best_threshold(CAL.threshold_sweep(labeled))
    assert best["f1"] >= 0.95, best


def test_pagerank_priors_invariants(spark):
    """G7 analog for the priors variant: Σrank = 1, and of two
    structurally identical nodes the one with the larger prior ranks
    higher (teleport mass follows the prior)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "a_key string, b_key string"
    )
    nodes = spark.createDataFrame(
        [("a", 10.0), ("b", 1.0), ("c", 1.0), ("d", 1.0)],
        "rec_key string, prior double",
    )
    pr = GW.pagerank_with_priors(nodes, edges, iters=8)
    rows = {r["rec_key"]: r["rank"] for r in pr.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-4
    # a and c are symmetric except for the prior
    assert rows["a"] > rows["c"]
    assert rows["b"] > rows["d"]  # inflow from the high-prior neighbor


def test_milne_witten_long_doc_fanout_bounded(spark):
    """One pathological document with hundreds of mid-df terms must not
    produce a quadratic pair partition: its contribution is capped at
    doc_topk choose 2."""
    rows = []
    # 60 small docs establish df >= MIN_SUPPORT for 300 terms
    terms = [f"t{i:03d}" for i in range(300)]
    for d in range(60):
        rows.append((d, " ".join(terms[(5 * d + j) % 300] for j in range(25))))
    rows.append((999, " ".join(terms)))  # the long doc: all 300 terms
    recs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    k = 16
    out = TFI.milne_witten_relatedness(recs, doc_topk=k)
    # total pairs bounded by n_docs * k(k-1)/2 regardless of the long doc
    assert out.count() <= 61 * k * (k - 1) // 2
    # and the long doc alone cannot have contributed more than k(k-1)/2
    # co-incremented pairs; with doc_topk disabled it would contribute
    # 300*299/2 = 44850 pairs on its own
    assert out.count() < 44850
