"""Meta-blocking — known-answer weight/pruning tests on a hand-built
block collection, plus plan pins (aggregated self-join, broadcast scalar
threshold)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_spark.operators import metablocking as MB


def _capped(spark):
    rows = [
        ("r1", "B1"), ("r1", "B2"),
        ("r2", "B1"), ("r2", "B2"),
        ("r3", "B2"), ("r3", "B3"),
        ("r4", "B4"),
    ]
    return spark.createDataFrame(rows, "rec_key string, block_key string")


def test_weights_known_answer(spark):
    got = {
        (r["a_key"], r["b_key"]): (r["cbs"], r["js_micro"])
        for r in MB.pair_block_weights(_capped(spark)).collect()
    }
    assert got == {
        ("r1", "r2"): (2, 1_000_000),  # 2/(2+2-2)
        ("r1", "r3"): (1, 333_333),    # floor(1e6/3)
        ("r2", "r3"): (1, 333_333),
    }


def test_wep_keeps_only_above_floor_mean(spark):
    # floor-mean = (1000000 + 333333 + 333333) // 3 = 555555
    kept = MB.wep_prune(MB.pair_block_weights(_capped(spark))).collect()
    assert [(r["a_key"], r["b_key"]) for r in kept] == [("r1", "r2")]


def test_cnp_union_top1(spark):
    # k=1: r1/r2 both keep (r1,r2); r3's tie between (r1,r3) and (r2,r3)
    # breaks on partner key → (r1,r3). Union semantics keep both pairs.
    kept = {
        (r["a_key"], r["b_key"])
        for r in MB.cnp_prune(MB.pair_block_weights(_capped(spark)), k=1).collect()
    }
    assert kept == {("r1", "r2"), ("r1", "r3")}


def test_wep_empty_input_is_empty(spark):
    empty = spark.createDataFrame([], "rec_key string, block_key string")
    assert MB.wep_prune(MB.pair_block_weights(empty)).count() == 0


def test_plan_threshold_broadcast_no_extra_shuffle(spark):
    """WEP's scalar threshold must reach the edge list as a broadcast
    (BroadcastNestedLoopJoin over the 1-row side is the cross-join plan),
    never a shuffled join; the weight aggregation gets map-side partial
    aggregation (two HashAggregate levels around the exchange)."""
    df = MB.wep_prune(MB.pair_block_weights(_capped(spark)))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Broadcast" in plan
    assert plan.count("HashAggregate") >= 2
