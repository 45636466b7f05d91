"""Structured Streaming incremental-linking tests: micro-batch folds
match the batch semantics, and a restarted stream resumes from Spark's
checkpoint without reprocessing committed batches (north_rule
resumability)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.operators import scoring as S
from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
from entity_linking_spark.sources.transcripts import synth_transcripts
from entity_linking_spark.streaming.incremental_stream import (
    ClusterState,
    run_incremental_stream,
)

# signature blocks only, matching the incremental query's config: the
# alias dictionary is corpus-global, so batch-split dictionaries would
# legitimately differ from a full-corpus run. block_cap=512 so no cap
# triggers on this fixture (the proven incremental == full-batch regime,
# tests/test_events_incremental.py::test_incremental_equals_full_batch)
CFG = LinkingConfig(block_cap=512, use_dict=False, use_fuzzy_dict=False)


def _full_batch_clusters(spark, tdf):
    records = B.prepare_records(tdf)
    edges = S.match_edges(
        S.pair_features(
            P.block_pairs(build_blocks(records, CFG), CFG.block_cap), records
        )
    )
    return C.clusters_with_singletons(records, edges, max_iter=CFG.cc_max_iter)


def _clusters_set(df):
    return {(r["rec_key"], r["cluster_id"]) for r in df.collect()}


def _land_batch(df, base, input_dir, name):
    """Write one batch as a single flat parquet FILE inside the watched
    directory (a nested `batch=N/` directory would be read back as a
    Hive partition column and break the declared stream schema)."""
    import glob
    import shutil

    staging = str(base / f"_staging_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
    shutil.rmtree(staging)


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    dirs = {
        "base": base,
        "input": str(base / "input"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(dirs["input"])
    tdf, _ = synth_transcripts(spark, n_convs=40, n_entities=8, seed=11)
    batches = [
        tdf.filter(F.col("conv_id") < "conv-000020"),
        tdf.filter(F.col("conv_id") >= "conv-000020"),
    ]
    return dirs, tdf, batches


def _drain(spark, dirs):
    query, state = run_incremental_stream(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], CFG
    )
    query.awaitTermination(300)
    return state


def test_stream_folds_batches_and_resumes(spark, stream_env):
    dirs, tdf, batches = stream_env

    # batch 1 lands -> bootstrap clustering of the first half
    _land_batch(batches[0], dirs["base"], dirs["input"], "batch0")
    state = _drain(spark, dirs)
    v1 = state.version()
    assert v1 is not None
    got1 = _clusters_set(state.load("clusters"))
    want1 = _clusters_set(_full_batch_clusters(spark, batches[0]))
    assert got1 == want1

    # batch 2 lands -> a RESTARTED stream (fresh query, same checkpoint)
    # folds only the new file; the bootstrap batch is not reprocessed
    _land_batch(batches[1], dirs["base"], dirs["input"], "batch1")
    state = _drain(spark, dirs)
    v2 = state.version()
    assert v2 is not None and v2 > v1
    got2 = state.load("clusters")
    assert got2.count() == tdf.count()
    # per the incremental == full-batch property (cap boundaries permitting
    # on this fixture), the folded clustering matches a from-scratch run
    want2 = _clusters_set(_full_batch_clusters(spark, tdf))
    assert _clusters_set(got2) == want2

    # idle restart: no new files -> no new state version (checkpointed
    # offsets prevent reprocessing; the fold is never re-entered)
    state = _drain(spark, dirs)
    assert state.version() == v2

    # records state preserves per-turn text parity (input_hint invariant)
    recs = state.load("records")
    assert recs.count() == tdf.count()
    joined = recs.join(
        B.prepare_records(tdf).select(
            "rec_key", F.col("norm_text").alias("want_norm")
        ),
        "rec_key",
    )
    assert joined.filter(F.col("norm_text") != F.col("want_norm")).count() == 0

    # per-batch counter metrics landed for both committed versions
    import json

    with open(os.path.join(dirs["state"], "metrics.jsonl")) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    assert {m["version"] for m in lines} == {v1, v2}
    final = next(m for m in lines if m["version"] == v2)
    assert final["rows"]["records"] == tdf.count()
    assert final["rows"]["clusters"] == tdf.count()
    assert final["wall_ms"] > 0


def test_stream_crash_before_pointer_commit_preserves_state(
    spark, tmp_path, monkeypatch
):
    """Crash-consistency (VERDICT r3 stretch): kill the fold AFTER the new
    version's state files are written but BEFORE the `_VERSION` pointer's
    os.replace. The previously committed state must be untouched, and a
    restarted stream must replay the interrupted batch (at-least-once
    foreachBatch + idempotent versioned write) and converge to the
    batch-twin clustering."""
    import json

    dirs = {
        "input": str(tmp_path / "input"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(dirs["input"])
    tdf, _ = synth_transcripts(spark, n_convs=30, n_entities=6, seed=23)
    b0 = tdf.filter(F.col("conv_id") < "conv-000015")
    b1 = tdf.filter(F.col("conv_id") >= "conv-000015")

    # batch 0 commits normally
    _land_batch(b0, tmp_path, dirs["input"], "batch0")
    query, state = run_incremental_stream(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], CFG
    )
    query.awaitTermination(300)
    v0 = state.version()
    assert v0 is not None
    committed = _clusters_set(state.load("clusters"))

    # batch 1 lands; the pointer commit dies (simulated crash)
    _land_batch(b1, tmp_path, dirs["input"], "batch1")
    real_replace = os.replace

    def dying_replace(src, dst, *a, **kw):
        if str(dst).endswith("_VERSION"):
            raise OSError("simulated crash before version-pointer commit")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", dying_replace)
    query, state = run_incremental_stream(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], CFG
    )
    with pytest.raises(Exception):
        query.awaitTermination(300)
        # availableNow drain: if no exception surfaced, the query must
        # still report the injected failure
        if query.exception() is not None:
            raise query.exception()
    monkeypatch.setattr(os, "replace", real_replace)

    # the previous version is intact: pointer, tables, and clustering
    assert state.version() == v0
    assert _clusters_set(state.load("clusters")) == committed

    # restart: Spark's checkpoint replays the uncommitted batch; the
    # replay overwrites its own half-written version and commits
    query, state = run_incremental_stream(
        spark, dirs["input"], dirs["state"], dirs["ckpt"], CFG
    )
    query.awaitTermination(300)
    v1 = state.version()
    assert v1 is not None and v1 > v0
    want = _clusters_set(_full_batch_clusters(spark, tdf))
    assert _clusters_set(state.load("clusters")) == want

    # audit trail: the interrupted attempt left a metrics line for v1
    # with no committed pointer at the time — so v1 appears TWICE
    # (failed attempt + successful replay), the documented marker
    with open(os.path.join(dirs["state"], "metrics.jsonl")) as f:
        versions = [json.loads(x)["version"] for x in f if x.strip()]
    assert versions.count(v1) == 2
