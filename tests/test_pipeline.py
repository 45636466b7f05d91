"""End-to-end pipeline tests on the seeded synthetic fixture: F1 gate,
blocking recall, determinism, skew handling, and checkpoint/resume —
the test plan of SURVEY.md §5.2."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import evaluation as E
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.operators import scoring as S
from entity_linking_spark.plans.pipeline import LinkingConfig, LinkingPipeline, build_blocks
from entity_linking_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def fixture(spark):
    tdf, gdf = synth_transcripts(spark, n_convs=60, n_entities=12, seed=42)
    return tdf.cache(), gdf.cache()


@pytest.fixture(scope="module")
def run(spark, fixture):
    tdf, _ = fixture
    pipe = LinkingPipeline(spark, LinkingConfig())
    return pipe.run(tdf)


def test_records_preserve_turns(spark, fixture, run):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — record count and keys match 1:1."""
    tdf, _ = fixture
    recs = run["records"]
    assert recs.count() == tdf.count()
    assert recs.select("conv_id", "turn_idx").distinct().count() == tdf.count()
    # rec_key sorts exactly like (conv_id, turn_idx)
    ordered = recs.orderBy("rec_key").select("conv_id", "turn_idx").collect()
    want = tdf.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx").collect()
    assert ordered == want


def test_blocking_recall_ceiling(spark, fixture, run):
    """Token blocking guarantees same-entity records meet (they share
    strong identifier tokens): recall ceiling ≥ 0.99."""
    _, gdf = fixture
    rec = E.blocking_recall(run["pairs"], gdf, run["records"])
    assert rec >= 0.99, f"blocking recall {rec:.3f}"


def test_pairwise_f1_on_candidate_pairs(spark, fixture, run):
    """North-rule gate: same-cluster decisions vs gold labels on candidate
    pairs at shared blocking key. The match rule is conservative (exact
    normalized-text or high token-Jaccard + low edit distance), so
    precision must be ~1; recall over *blocked* pairs is high because
    variants of the same alias share signatures."""
    _, gdf = fixture
    res = E.pairwise_f1(run["pairs"], gdf, run["records"], run["clusters"])
    assert res["precision"] >= 0.99, res
    assert res["f1"] >= 0.99, res


def test_exact_duplicate_turns_cluster_together(spark, run, fixture):
    """Turns with identical normalized text must always share a cluster."""
    recs = run["records"]
    clusters = run["clusters"]
    joined = recs.join(clusters, "rec_key").select("norm_text", "cluster_id")
    n_violating = (
        joined.filter(F.col("norm_text") != "")
        .groupBy("norm_text")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_violating == 0


def test_pipeline_deterministic(spark, fixture):
    tdf, _ = fixture
    out1 = LinkingPipeline(spark, LinkingConfig()).run(tdf)["clusters"]
    out2 = LinkingPipeline(spark, LinkingConfig()).run(tdf)["clusters"]
    r1 = sorted((r["rec_key"], r["cluster_id"]) for r in out1.collect())
    r2 = sorted((r["rec_key"], r["cluster_id"]) for r in out2.collect())
    assert r1 == r2


def test_hot_key_skew_capped(spark):
    """A planted hot alias (40% of turns) must not explode the pair count:
    the block cap bounds pairs to ~cap²/2 per block."""
    tdf, _ = synth_transcripts(spark, n_convs=80, n_entities=10, seed=1, hot_alias_rate=0.4)
    cfg = LinkingConfig(block_cap=32)
    records = B.prepare_records(tdf)
    blocks = build_blocks(records, cfg)
    n_pairs = P.block_pairs(blocks, cfg.block_cap).count()
    n_recs = records.count()
    assert n_pairs < 40 * n_recs, f"{n_pairs} pairs for {n_recs} records"


def test_salted_blocks_keep_partial_coverage(spark):
    """salt_blocks keeps hot-key rows pair-able (within shards) instead of
    dropping the key entirely like the cap does."""
    tdf, _ = synth_transcripts(spark, n_convs=40, n_entities=8, seed=3, hot_alias_rate=0.5)
    records = B.prepare_records(tdf)
    blocks = B.first_token_blocks(records)
    salted = B.salt_blocks(blocks, n_salt=8, hot_threshold=16)
    # every original row still carries exactly one block key
    assert salted.count() == blocks.count()
    capped_plain = P.block_pairs(blocks, cap=16).count()
    capped_salted = P.block_pairs(salted, cap=64).count()
    assert capped_salted > capped_plain  # shards survive where hot key was dropped


def test_checkpoint_resume(spark, fixture, tmp_path):
    """Kill-after-stage-commit semantics: a second run with the same
    checkpoint dir loads committed stages (resumed=True) and produces
    identical clusters."""
    tdf, _ = fixture
    ck = str(tmp_path / "ckpt")
    p1 = LinkingPipeline(spark, LinkingConfig(), checkpoint_dir=ck)
    out1 = p1.run(tdf)
    got1 = sorted((r["rec_key"], r["cluster_id"]) for r in out1["clusters"].collect())
    assert all(not m.get("resumed") for m in p1.metrics)

    p2 = LinkingPipeline(spark, LinkingConfig(), checkpoint_dir=ck)
    out2 = p2.run(tdf)
    got2 = sorted((r["rec_key"], r["cluster_id"]) for r in out2["clusters"].collect())
    assert got1 == got2
    assert all(m.get("resumed") for m in p2.metrics), p2.metrics


def test_lineage_metrics_recorded(spark, fixture, tmp_path):
    tdf, _ = fixture
    pipe = LinkingPipeline(spark, LinkingConfig(), checkpoint_dir=str(tmp_path / "ck2"))
    pipe.run(tdf)
    mdf = pipe.metrics_df()
    rows = {r["stage"]: r for r in mdf.collect()}
    assert set(rows) == set(LinkingPipeline.STAGES)
    assert all(r["rows"] > 0 for r in rows.values())


def test_scored_pairs_with_jaro_winkler(spark, fixture, run):
    """Pandas-UDF scorer path: scores in [0,1], exact pairs score highest."""
    feats = run["features"]
    scored = S.scored_pairs(feats, with_jw=True)
    rows = scored.select("score", "jw", "exact").collect()
    assert rows, "no scored pairs"
    assert all(0.0 <= r["score"] <= 1.0 and 0.0 <= r["jw"] <= 1.0 for r in rows)
    exact_scores = [r["score"] for r in rows if r["exact"] == 1]
    if exact_scores:
        assert min(exact_scores) > 0.9


def test_crash_between_stage_write_and_manifest_commit(
    spark, fixture, tmp_path, monkeypatch
):
    """Batch twin of the streaming crash-before-pointer-commit test
    (VERDICT r4 stretch item 8): kill the run AFTER the 'pairs' stage's
    parquet lands on disk but BEFORE its manifest entry commits
    (`os.replace` is the atomic commit point in `_commit`). The orphaned
    parquet must be invisible to resume — the next run re-uses the two
    COMMITTED stages, recomputes 'pairs' (overwriting the orphan) and
    everything after it, and converges to the same clusters as a clean
    run."""
    import os as _os

    import entity_linking_spark.plans.pipeline as PL

    tdf, _ = fixture
    ck = str(tmp_path / "ck_crash")

    clean = sorted(
        (r["rec_key"], r["cluster_id"])
        for r in LinkingPipeline(spark, LinkingConfig())
        .run(tdf)["clusters"]
        .collect()
    )

    real_replace = _os.replace
    manifest = _os.path.join(ck, "_MANIFEST.json")

    def crashing_replace(src, dst):
        if dst == manifest:
            with open(src) as f:
                staged = f.read()
            if '"pairs"' in staged:
                raise OSError("simulated crash before manifest commit")
        return real_replace(src, dst)

    monkeypatch.setattr(PL.os, "replace", crashing_replace)
    p1 = LinkingPipeline(spark, LinkingConfig(), checkpoint_dir=ck)
    with pytest.raises(OSError, match="simulated crash"):
        p1.run(tdf)
    monkeypatch.setattr(PL.os, "replace", real_replace)

    # on-disk post-crash state: records+blocks committed; the pairs
    # parquet is an ORPHAN (written, uncommitted — exactly the torn state)
    committed = set(
        __import__("json").load(open(manifest))["stages"]
    ) if _os.path.exists(manifest) else set()
    assert committed == {"records", "blocks"}, committed
    assert _os.path.exists(_os.path.join(ck, "pairs"))  # orphan present

    p2 = LinkingPipeline(spark, LinkingConfig(), checkpoint_dir=ck)
    out2 = p2.run(tdf)
    resumed = {m["stage"] for m in p2.metrics if m.get("resumed")}
    recomputed = {m["stage"] for m in p2.metrics if not m.get("resumed")}
    assert resumed == {"records", "blocks"}, p2.metrics
    assert recomputed == {"pairs", "features", "edges", "clusters"}
    got = sorted(
        (r["rec_key"], r["cluster_id"]) for r in out2["clusters"].collect()
    )
    assert got == clean
