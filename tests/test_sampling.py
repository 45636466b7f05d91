"""Sampling / split / stratified-cap operators (`operators/sampling.py`).

Covers: rate accuracy, per-key consistency (conversation never torn),
split disjoint+exhaustive, stratified cap exactness vs the declarative
window rule, the under-fill fallback path, and plan shape (sampling is a
pure filter — no Exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import sampling as SMP


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def turns(spark):
    from entity_linking_spark.sources.transcripts import derive_transcripts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return derive_transcripts(docs)


def test_hash_sample_rate_and_determinism(docs):
    n = docs.count()
    got = SMP.hash_sample(docs, "doc_id", 2000).count()
    # 20% ± 5 percentage points at n=500
    assert abs(got / n - 0.20) < 0.05
    again = SMP.hash_sample(docs, "doc_id", 2000).count()
    assert got == again
    assert SMP.hash_sample(docs, "doc_id", 0).count() == 0
    assert SMP.hash_sample(docs, "doc_id", SMP.BP_SCALE).count() == n


def test_hash_sample_seed_changes_membership(docs):
    a = {r.doc_id for r in SMP.hash_sample(docs, "doc_id", 3000, seed=1).collect()}
    b = {r.doc_id for r in SMP.hash_sample(docs, "doc_id", 3000, seed=2).collect()}
    assert a != b
    assert a and b


def test_hash_sample_conversation_consistency(turns):
    """Keying on conv_id keeps whole conversations: each sampled conv_id
    retains exactly its full turn count."""
    sampled = SMP.hash_sample(turns, "conv_id", 3000)
    full = turns.groupBy("conv_id").count().withColumnRenamed("count", "n_all")
    kept = sampled.groupBy("conv_id").count().withColumnRenamed("count", "n_kept")
    torn = kept.join(full, "conv_id").filter("n_kept <> n_all").count()
    assert torn == 0


def test_hash_sample_is_pure_filter_no_exchange(docs):
    plan = SMP.hash_sample(docs, "doc_id", 2000)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fast_mode_same_rate_shape(docs):
    got = SMP.hash_sample(docs, "doc_id", 2000, hash_mode="fast").count()
    assert abs(got / docs.count() - 0.20) < 0.06


def test_split_disjoint_exhaustive(docs):
    splits = [("train", 8000), ("val", 1000), ("test", 1000)]
    out = SMP.split_assign(docs, "doc_id", splits)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # per-key consistency: same key -> same split under a fixed seed
    again = {r.doc_id: r["split"] for r in SMP.split_assign(docs, "doc_id", splits).collect()}
    first = {r.doc_id: r["split"] for r in out.collect()}
    assert first == again


def test_split_weights_must_sum(docs):
    with pytest.raises(ValueError):
        SMP.split_assign(docs, "doc_id", [("a", 5000), ("b", 4000)])


def _window_reference(docs, group_cols, key_col, cap, seed):
    from pyspark.sql import Window

    h = SMP.hash60(F.col(key_col), seed)
    w = Window.partitionBy(*group_cols).orderBy(h.alias("_h"), key_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


@pytest.mark.parametrize("cap", [1, 7, 20])
def test_stratified_cap_exact_vs_declarative(docs, cap):
    got = SMP.stratified_cap(docs, ["source"], "doc_id", cap)
    ref = _window_reference(docs, ["source"], "doc_id", cap, SMP.DEFAULT_SEED)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    per_grp = got.groupBy("source").count()
    sizes = {r.source: r["count"] for r in per_grp.collect()}
    full = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    for g, n in full.items():
        assert sizes.get(g, 0) == min(cap, n)


def test_stratified_cap_underfill_fallback(docs):
    """safety<1 forces the prefilter to under-select, exercising the
    distributed re-rank fallback — the result must stay exact."""
    got = SMP.stratified_cap(docs, ["source"], "doc_id", 15, safety=0.2)
    ref = _window_reference(docs, ["source"], "doc_id", 15, SMP.DEFAULT_SEED)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_stratified_cap_window_input_is_bounded(docs):
    """The pre-filtered candidate set the window sorts is ~safety*cap per
    group, not the whole group — the scale property the operator exists
    for."""
    cap, safety = 5, 4.0
    h = SMP.hash60(F.col("doc_id"), SMP.DEFAULT_SEED)
    base = docs.withColumn("_h", h)
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("_grp_n"))
    max_h = float(1 << SMP.H_BITS)
    thr = F.when(F.col("_grp_n") <= int(cap * safety), F.lit(max_h)).otherwise(
        F.lit(max_h) * F.lit(cap * safety) / F.col("_grp_n")
    )
    pre = base.join(counts.withColumn("_thr", thr), ["source"]).filter(
        F.col("_h") < F.col("_thr").cast("long") + F.lit(1)
    )
    biggest = max(
        r["count"] for r in pre.groupBy("source").count().collect()
    )
    # binomial mean is safety*cap = 20; assert the survivor set stays
    # O(safety*cap), far below the raw group sizes (~100)
    assert biggest <= int(cap * safety * 3)
    full_max = max(r["count"] for r in docs.groupBy("source").count().collect())
    assert full_max > cap * safety  # the prefilter actually mattered
