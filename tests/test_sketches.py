"""HyperLogLog sketch: accuracy vs exact counts, merge property, and a
pure-Python register reference (guards against Spark and DuckDB sharing a
translation bug — the oracle parity suite alone can't see that)."""

from __future__ import annotations

import hashlib
import os
import sys

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
