"""Conversation-grain analytics: profile aggregates + curation filter.

Invariant style: cross-check the one-shuffle aggregate against
independently computed per-conversation facts from the raw fixture.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import conversations as CONV
from entity_linking_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    tdf, _ = synth_transcripts(spark, n_convs=40, n_entities=10, seed=7)
    return tdf.cache()


def test_conversation_stats_invariants(transcripts):
    stats = {r["conv_id"]: r for r in CONV.conversation_stats(transcripts).collect()}
    raw = transcripts.collect()
    turns = Counter(r["conv_id"] for r in raw)
    assert set(stats) == set(turns)
    for conv_id, n in turns.items():
        s = stats[conv_id]
        assert s["n_turns"] == n
        rows = [r for r in raw if r["conv_id"] == conv_id]
        assert s["n_user_turns"] == sum(r["role"] == "user" for r in rows)
        assert s["n_assistant_turns"] == sum(r["role"] == "assistant" for r in rows)
        assert s["n_tool_calls"] == sum(r["tool"] is not None for r in rows)
        assert s["total_chars"] == sum(len(r["text"]) for r in rows)
        assert s["n_roles"] == len({r["role"] for r in rows})
        span = max(r["ts"] for r in rows) - min(r["ts"] for r in rows)
        assert s["duration_us"] == int(span.total_seconds() * 1_000_000)
        assert s["first_ts"] <= s["last_ts"]


def test_degenerate_conversations_bounds(spark, transcripts):
    # synth turns per conv ∈ [2, 8]: nothing degenerate at default bounds
    assert CONV.degenerate_conversations(transcripts).count() == 0
    # tighten bounds: every conv with <4 or >6 turns flagged, reason split
    flagged = CONV.degenerate_conversations(
        transcripts, min_turns=4, max_turns=6
    ).collect()
    counts = (
        transcripts.groupBy("conv_id").count().collect()
    )
    expect_short = {r["conv_id"] for r in counts if r["count"] < 4}
    expect_long = {r["conv_id"] for r in counts if r["count"] > 6}
    assert {r["conv_id"] for r in flagged if r["reason"] == "too_short"} == expect_short
    assert {r["conv_id"] for r in flagged if r["reason"] == "too_long"} == expect_long


def test_conversation_stats_single_shuffle_plan(transcripts):
    """Scale contract: the whole profile is ONE hash-partitioned aggregate
    with a partial (map-side) phase — no join, no window, no second
    Exchange."""
    plan = CONV.conversation_stats(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Join" not in plan


def test_conversation_grain_neardup(spark):
    """Two whole conversations sharing (near-)identical content are found
    by the document near-dup family run at the conversation grain."""
    import datetime

    from entity_linking_spark.operators import blocking as B
    from entity_linking_spark.operators import dedup as D

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    shared = (
        "the deployment failed because the config map was missing the "
        "database url please add it and retry the rollout now"
    ).split()
    rows = []
    for c, words in [
        (0, shared),
        (1, shared[:-1] + ["immediately"]),  # near-dup of conv 0
        (2, "totally unrelated conversation about quarterly revenue "
            "projections and the offsite agenda planning details".split()),
    ]:
        for t in range(0, len(words), 6):
            rows.append(
                (f"conv-{c:06d}", t // 6, "user", " ".join(words[t:t + 6]),
                 None, base)
            )
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    recs = B.prepare_records(tdf)
    convs = CONV.conversation_records(recs)
    got = {tuple(sorted((r["a_id"], r["b_id"])))
           for r in D.minhash_neardup_pairs(convs).collect()}
    assert got == {(0, 1)}


def test_conversation_records_bounds_runaway_sessions(spark):
    """VERDICT r3 item 5: a planted 10k-turn runaway agent session is
    truncated at max_turns INSIDE the roll-up (the aggregation state
    never holds more than max_turns turns), with the audit columns
    recording the untruncated count; normal conversations pass through
    untouched."""
    import datetime

    from entity_linking_spark.operators import blocking as B

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (f"conv-{0:06d}", t, "assistant", f"loop step {t} retrying", None, base)
        for t in range(10_000)
    ]
    rows += [
        (f"conv-{1:06d}", t, "user", f"short conversation turn {t}", None, base)
        for t in range(3)
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    recs = B.prepare_records(tdf)
    out = {r["doc_key"]: r for r in CONV.conversation_records(recs, max_turns=64).collect()}

    runaway = out["000000"]
    assert runaway["n_turns"] == 10_000
    assert runaway["truncated"] == 1
    # exactly the first 64 turns survive, in turn order
    assert runaway["norm_text"].count("loop step") == 64
    assert runaway["norm_text"].startswith("loop step 0 retrying")
    assert "loop step 64 " not in runaway["norm_text"]

    normal = out["000001"]
    assert normal["n_turns"] == 3 and normal["truncated"] == 0
    assert normal["norm_text"].count("turn") == 3
