"""Sorted-neighborhood blocking — semantic known-answer tests (exact rank
and pair sets, the closed-form pair-count budget, multi-pass dedup) plus
plan pins for the module's two scale claims: bucket-local rank windows
(no global-order corpus window) and chunked equi-join pairing (no range
join, no nested loop)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from entity_linking_spark.operators import snm as SNM


def _records(spark, keys):
    """rec_key r00..rNN with the given norm_text keys."""
    rows = [(f"r{i:02d}", k) for i, k in enumerate(keys)]
    return spark.createDataFrame(rows, "rec_key string, norm_text string")


def test_snm_ranks_match_global_sort(spark):
    """Bucket-spine rank == row_number over the true global order, on a
    fixture spanning several prefix buckets with intra-bucket ties."""
    keys = ["apple", "apricot", "banana", "banana", "cherry", "ax", "b", ""]
    recs = _records(spark, keys)
    got = {r["rec_key"]: r["rnk"] for r in SNM.snm_ranks(recs, F.col("norm_text")).collect()}
    w = Window.orderBy("norm_text", "rec_key")
    want = {
        r["rec_key"]: r["rnk"]
        for r in recs.select("rec_key", F.row_number().over(w).alias("rnk")).collect()
    }
    assert got == want


def test_snm_pass_exact_pairs_window3(spark):
    """w=3 on 5 distinct sorted keys → exactly the rank pairs with
    distance 1 or 2."""
    # sorted order: a<b<c<d<e → rec keys r00..r04 in that order
    recs = _records(spark, ["a", "b", "c", "d", "e"])
    ranks = SNM.snm_ranks(recs, F.col("norm_text"))
    pairs = {
        (r["a_key"], r["b_key"])
        for r in SNM.snm_pass_pairs(ranks, window=3).collect()
    }
    want = {
        ("r00", "r01"), ("r01", "r02"), ("r02", "r03"), ("r03", "r04"),
        ("r00", "r02"), ("r01", "r03"), ("r02", "r04"),
    }
    assert pairs == want


def test_snm_pair_budget_closed_form(spark):
    """Single pass over N=20 records, w=5 → exactly (w−1)·N − (w−1)·w/2
    pairs — the linear candidate budget that needs no cap."""
    n, w = 20, 5
    recs = _records(spark, [f"k{i:03d}" for i in range(n)])
    ranks = SNM.snm_ranks(recs, F.col("norm_text"))
    got = SNM.snm_pass_pairs(ranks, window=w).count()
    assert got == (w - 1) * n - (w - 1) * w // 2


def test_snm_multipass_dedups_and_adds_recall(spark):
    """Front and back passes union-distinct: a pair found by both appears
    once; a pair adjacent only under the reversed key is found."""
    # 'aaxx' and 'zzxx' are far apart sorted front-ways but adjacent
    # reversed ('xxaa' vs 'xxzz' share the neighborhood when every other
    # key reversed starts differently).
    keys = ["aaxx", "ammm", "annn", "aooo", "appp", "aqqq", "arrr", "asss",
            "atttt", "auuu", "zzxx"]
    recs = _records(spark, keys)
    pairs = SNM.snm_pairs(recs, window=3)
    rows = [(r["a_key"], r["b_key"]) for r in pairs.collect()]
    assert len(rows) == len(set(rows))  # distinct across passes
    assert ("r00", "r10") in set(rows)  # aaxx ↔ zzxx via the reverse pass


def test_snm_plan_no_global_window_no_range_join(spark):
    """Plan pins: the corpus-sized rank window is partitioned by
    snm_bucket (the only unpartitioned window is the ≤|buckets|-row
    spine), and pairing is an equi-join — no nested loop, no cartesian."""
    recs = _records(spark, ["a", "b", "c"])
    plan = recs.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        SNM.snm_pairs(recs)._jdf.queryExecution(), "formatted"
    )
    assert "windowspecdefinition(snm_bucket" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the record-side rank join gets the tiny spine broadcast
    assert "BroadcastHashJoin" in plan
