"""Tests for event-stream analytics and incremental linking."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import events as EV
from entity_linking_spark.operators import incremental as INC
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.operators import scoring as S
from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
from entity_linking_spark.sources.transcripts import synth_transcripts

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def events(spark):
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: events at 0, 10, 20 (one session), then 60 (new session)
        (1, ts(0), 1, "click", 1.0, '{"k": 1}'),
        (2, ts(10), 1, "click", 2.0, '{"k": 2}'),
        (3, ts(20), 1, "view", 3.0, '{"k": 3}'),
        (4, ts(60), 1, "click", 4.0, '{"k": 4}'),
        # user 2: single event
        (5, ts(5), 2, "error", 10.0, '{"k": 5}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_detection(events):
    sessions = {
        (r["user_id"], r["session_idx"]): r for r in EV.sessionize(events).collect()
    }
    assert len(sessions) == 3
    s1 = sessions[(1, 1)]
    assert s1["n_events"] == 3 and s1["total_value"] == pytest.approx(6.0)
    s2 = sessions[(1, 2)]
    assert s2["n_events"] == 1 and s2["total_value"] == pytest.approx(4.0)
    assert sessions[(2, 1)]["n_events"] == 1


def test_tumbling_and_topk_and_json(events):
    tumb = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in EV.tumbling_counts(events).collect()
    }
    assert tumb[(0, "click")] == 2  # minutes 0,10 in hour 0
    assert tumb[(1, "click")] == 1  # minute 60 in hour 1
    topk = [
        r["event_id"]
        for r in EV.user_topk_events(events, k=2).collect()
        if r["user_id"] == 1
    ]
    assert topk == [4, 3]  # by value desc
    ks = {r["event_id"]: r["k"] for r in EV.json_props(events).collect()}
    assert ks == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


# ---------------------------------------------------------------------------
# incremental linking
# ---------------------------------------------------------------------------


def _full_batch_clusters(records, cfg):
    blocks = build_blocks(records, cfg)
    prs = P.block_pairs(blocks, cfg.block_cap)
    edges = S.match_edges(S.pair_features(prs, records))
    return C.clusters_with_singletons(records, edges, max_iter=cfg.cc_max_iter)


def test_incremental_equals_full_batch(spark):
    """Folding the second half of a corpus into the first half's clusters
    must give exactly the full-batch clustering (star-edge transitivity).
    Fixture is small enough that no block cap triggers, so the pair sets
    coincide exactly."""
    cfg = LinkingConfig(block_cap=512)
    tdf, _ = synth_transcripts(spark, n_convs=40, n_entities=8, seed=11)
    old_t = tdf.filter(F.col("conv_id") < "conv-000020")
    new_t = tdf.filter(F.col("conv_id") >= "conv-000020")

    old_records = B.prepare_records(old_t)
    old_clusters = _full_batch_clusters(old_records, cfg)

    inc = INC.incremental_link(old_records, old_clusters, new_t, cfg)

    full = _full_batch_clusters(B.prepare_records(tdf), cfg)
    got = sorted((r["rec_key"], r["cluster_id"]) for r in inc.collect())
    want = sorted((r["rec_key"], r["cluster_id"]) for r in full.collect())
    assert got == want


def test_incremental_bridges_old_clusters(spark):
    """A new record matching members of two previously-separate clusters
    must merge them (transitivity across batches)."""
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    # old: two distinct texts → two clusters
    old_rows = [
        ("c1", 0, "user", "alpha beta gamma delta", None, t0),
        ("c2", 0, "user", "omega psi chi phi", None, t0),
    ]
    # new: one record whose tokens overlap both heavily enough to match
    new_rows = [
        ("c3", 0, "user", "alpha beta gamma delta omega psi chi phi", None, t0),
    ]
    cfg = LinkingConfig(block_cap=512)
    old_t = spark.createDataFrame(old_rows, schema)
    new_t = spark.createDataFrame(new_rows, schema)
    old_records = B.prepare_records(old_t)
    old_clusters = _full_batch_clusters(old_records, cfg)
    assert old_clusters.select("cluster_id").distinct().count() == 2

    inc = INC.incremental_link(old_records, old_clusters, new_t, cfg)
    n_clusters = inc.select("cluster_id").distinct().count()
    # bridge record has Jaccard 1/2 with each old record → all merge
    assert n_clusters == 1


def test_incremental_untouched_cluster_keeps_id(spark):
    """Idempotence/auditability: clusters not touched by the new batch
    keep their cluster ids."""
    cfg = LinkingConfig()
    tdf, _ = synth_transcripts(spark, n_convs=30, n_entities=6, seed=5)
    old_t = tdf.filter(F.col("conv_id") < "conv-000025")
    new_t = tdf.filter(F.col("conv_id") >= "conv-000025")
    old_records = B.prepare_records(old_t)
    old_clusters = _full_batch_clusters(old_records, cfg)
    inc = INC.incremental_link(old_records, old_clusters, new_t, cfg)

    # old cluster ids present before must survive or merge downward (min
    # convention: an id disappears only by merging into a smaller key)
    old_ids = {r["cluster_id"] for r in old_clusters.select("cluster_id").distinct().collect()}
    new_ids = {r["cluster_id"] for r in inc.select("cluster_id").distinct().collect()}
    merged_away = old_ids - new_ids
    # every merged-away id must now map to a smaller id in its component
    if merged_away:
        mapping = {
            r["rec_key"]: r["cluster_id"]
            for r in inc.filter(F.col("rec_key").isin(list(merged_away))).collect()
        }
        assert all(mapping[k] < k for k in merged_away)
