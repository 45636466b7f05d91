"""HyperLogLog sketch: accuracy vs exact counts, merge property, and a
pure-Python register reference (guards against Spark and DuckDB sharing a
translation bug — the oracle parity suite alone can't see that)."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_spark.operators import sketches as SK


def _keys_df(spark, n_distinct, repeat=1):
    df = spark.range(n_distinct).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("k"),
        F.lit("g").alias("g"),
    )
    for _ in range(repeat - 1):
        df = df.unionAll(df.limit(n_distinct))
    return df


def test_hll_accuracy_hll_regime(spark):
    """20k distinct >> 2.5m: raw-HLL branch; m=256 → σ ≈ 6.5%."""
    df = _keys_df(spark, 20_000, repeat=2)
    est = SK.hll_distinct(df, "k", []).collect()[0]["hll_distinct"]
    assert abs(est - 20_000) / 20_000 < 0.15, est


def test_hll_accuracy_linear_counting_regime(spark):
    """100 distinct << 2.5m: linear-counting branch, few-% error."""
    df = _keys_df(spark, 100, repeat=3)
    row = SK.hll_distinct(df, "k", []).collect()[0]
    assert row["n_zero_registers"] > 0
    assert abs(row["hll_distinct"] - 100) / 100 < 0.10, row


def test_hll_duplicates_do_not_move_estimate(spark):
    """The sketch sees the key set, not the row multiset."""
    one = SK.hll_distinct(_keys_df(spark, 500, repeat=1), "k", []).collect()[0]
    many = SK.hll_distinct(_keys_df(spark, 500, repeat=4), "k", []).collect()[0]
    assert one["reg_sum"] == many["reg_sum"]
    assert one["hll_distinct"] == many["hll_distinct"]


def test_hll_merge_equals_global(spark):
    """Union property: merging per-group register tables (max per
    register) is bit-identical to sketching the whole input at once."""
    df = spark.range(5_000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
    )
    merged = SK.merge_registers(SK.hll_registers(df, "k", ["g"]), [])
    direct = SK.hll_registers(df, "k", [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_m = SK.hll_estimate(merged, []).collect()[0]
    est_d = SK.hll_estimate(direct, []).collect()[0]
    assert est_m == est_d


def _python_registers(keys):
    """Independent reference: md5-prefix 60-bit hash, low 8 bits index,
    rho = 53 - bitlength(upper 52 bits)."""
    regs = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        idx = h & (SK.M_REG - 1)
        w = h >> SK.P_BITS
        rho = SK.RHO_MAX if w == 0 else SK.RHO_MAX - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_hll_registers_match_python_reference(spark):
    keys = [f"ref-{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["reg_idx"]: r["reg_rho"]
        for r in SK.hll_registers(df, "k", []).collect()
    }
    assert got == _python_registers(keys)


def test_hll_partial_aggregation_in_plan(spark):
    """The register build must partial-agg (map-side combine) so a hot
    group collapses to ≤ m rows per partition before the shuffle."""
    df = _keys_df(spark, 1_000)
    plan = (
        SK.hll_registers(df, "k", ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan or "HashAggregate" in plan, plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def token_stream(spark):
    from entity_linking_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return D.doc_records(docs).select(F.explode("tokens").alias("token"))


def test_cms_never_undercounts_and_is_tight_here(token_stream):
    counters = SK.cms_counters(token_stream, "token", [])
    probes = token_stream.select("token").distinct()
    est = SK.cms_lookup(counters, probes, "token", [])
    exact = token_stream.groupBy("token").agg(F.count("*").alias("exact"))
    rows = est.join(exact, "token").collect()
    assert rows
    assert all(r.cms_count >= r.exact for r in rows)  # CMS guarantee
    # at w=1024 over a small vocab, collisions are absent: estimates exact
    assert all(r.cms_count == r.exact for r in rows)


def test_cms_counter_table_is_bounded(token_stream):
    counters = SK.cms_counters(token_stream, "token", [])
    assert counters.count() <= SK.CMS_DEPTH * SK.CMS_WIDTH


def test_cms_merge_by_sum_equals_whole(spark, token_stream):
    """Element-wise summing two halves' counter tables equals the counter
    table of the union — the property that lets per-partition/per-day
    sketches fold."""
    t = token_stream.withColumn("_h", F.crc32(F.col("token")) % 2)
    a = SK.cms_counters(t.filter("_h = 0"), "token", [])
    b = SK.cms_counters(t.filter("_h = 1"), "token", [])
    merged = (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.cms_counters(token_stream, "token", [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_grouped_and_fast_mode(token_stream):
    t = token_stream.withColumn("g", F.length("token") % 2)
    counters = SK.cms_counters(t, "token", ["g"], hash_mode="fast")
    probes = t.select("g", "token").distinct()
    est = SK.cms_lookup(counters, probes, "token", ["g"], hash_mode="fast")
    exact = t.groupBy("g", "token").agg(F.count("*").alias("exact"))
    rows = est.join(exact, ["g", "token"]).collect()
    assert rows and all(r.cms_count >= r.exact for r in rows)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, 400, 2)], ["k"]
    )


def test_bloom_no_false_negatives(spark, members):
    bloom = SK.bloom_build(members, "k")
    probed = SK.bloom_probe(members, bloom, "k")
    assert probed.filter("NOT might_contain").count() == 0


def test_bloom_false_positive_rate_bounded(spark, members):
    bloom = SK.bloom_build(members, "k")
    non = spark.createDataFrame([(f"other-{i}",) for i in range(2000)], ["k"])
    fp = SK.bloom_probe(non, bloom, "k").filter("might_contain").count()
    # n=200, k=5, m=16384 -> theoretical fp ~ 2e-6; allow slack
    assert fp <= 5


def test_bloom_probe_never_shuffles_fact(spark, members):
    bloom = SK.bloom_build(members, "k")
    fact = spark.range(0, 10_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    plan = (
        SK.bloom_probe(fact, bloom, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only hash exchange allowed is the tiny build side (word_idx
    # groupBy); the fact side must reach the join with zero shuffles
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word_idx" in line, plan
    assert "BroadcastNestedLoopJoin" in plan


def test_bloom_word_table_merges_by_bit_or(spark, members):
    half_a = members.filter(F.col("k") < "key-2")
    half_b = members.filter(F.col("k") >= "key-2")
    merged = (
        SK.bloom_build(half_a, "k")
        .unionByName(SK.bloom_build(half_b, "k"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    whole = SK.bloom_build(members, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


# ---------------------------------------------------------------------------
# Histogram quantiles
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_histogram_quantiles_within_bin_width_of_rank(events):
    """The estimator's guarantee is rank-accurate: the estimate lies in
    the bin where the cumulative count crosses q·n, so it is within one
    bin width of the order statistic at that rank."""
    import math

    qs = [0.5, 0.9, 0.99]
    got = {
        (r.event_type, r.q): r.hist_q
        for r in SK.histogram_quantiles(events, "value", ["event_type"], qs).collect()
    }
    assert got
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for g, vs in vals.items():
        vs.sort()
        width = (vs[-1] - vs[0]) / SK.HIST_BINS
        for q in qs:
            order_stat = vs[math.ceil(q * len(vs)) - 1]
            assert abs(got[(g, q)] - order_stat) <= width + 1e-9, (g, q)


def test_histogram_quantiles_monotone_and_in_range(events):
    qs = [0.1, 0.5, 0.9]
    rows = SK.histogram_quantiles(events, "value", ["event_type"], qs).collect()
    per_g = {}
    for r in rows:
        per_g.setdefault(r.event_type, {})[r.q] = r.hist_q
    for g, d in per_g.items():
        assert d[0.1] <= d[0.5] <= d[0.9]


def test_histogram_quantiles_degenerate_single_value(spark):
    df = spark.createDataFrame([("a", 5.0)] * 10, ["g", "v"])
    rows = SK.histogram_quantiles(df, "v", ["g"], [0.5, 0.9]).collect()
    assert {r.hist_q for r in rows} == {5.0}


def test_histogram_quantiles_bounded_window_state(events):
    """The only window in the plan runs over the bin table (<= n_bins rows
    per group), never over raw values."""
    plan = (
        SK.histogram_quantiles(events, "value", ["event_type"], [0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percentile" not in plan.lower()
    # the window's input is the aggregated bin table: the plan prints
    # root-first, so the HashAggregate (bin counts) appears BELOW the
    # Window operator consuming it
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate")
